"""Chat templates, MarkMatcher, and multi-turn session tests (vs the
reference semantics in crabml-llama2/src/chat.rs)."""

from crabml_tpu.runtime.chat import ChatSession, ChatTemplate, MarkMatcher
from crabml_tpu.runtime.runner import Runner


def test_template_guess():
    g = ChatTemplate.heuristic_guess
    assert g("gemma-2b-it", "gemma", "") == ChatTemplate.GEMMA
    assert g("tinyllama2", "llama", "") == ChatTemplate.LLAMA2
    assert g("qwen2-7b", "qwen2", "blah <|im_start|> blah") == ChatTemplate.CHATML
    assert g("meta-llama3-8b", "llama", "") == ChatTemplate.LLAMA3
    assert g("mystery", "llama", "") == ChatTemplate.LLAMA2


def test_template_apply():
    s = ChatTemplate.CHATML.apply("hi", "be nice")
    assert s == "<|im_start|>system\nbe nice<|im_end|><|im_start|>user\nhi<|im_end|><|im_start|>assistant\n"
    s = ChatTemplate.GEMMA.apply("hi", None, append_assistant_prefix=False)
    assert s == "<start_of_turn>user\n hi<end_of_turn>"
    s = ChatTemplate.LLAMA3.apply("q")
    assert "<|start_header_id|>user<|end_header_id|>\n\nq<|eot_id|>" in s


def test_mark_matcher_exact():
    m = MarkMatcher(["<end_of_turn>"])
    assert m.push("hello") == "hello"
    assert m.push("<end_of_turn>") == "<end_of_turn>"


def test_mark_matcher_multi_token():
    m = MarkMatcher(["<end_of_turn>"])
    assert m.push("<end") is None
    assert m.push("_of") is None
    assert m.push("_turn>") == "<end_of_turn>"


def test_mark_matcher_false_start():
    m = MarkMatcher(["<end_of_turn>"])
    assert m.push("<end") is None
    assert m.push("less") == "<endless"  # flushed buffer, back to inactive
    assert m.push("ok") == "ok"


def test_chat_session_multiturn(stories260k_path):
    r = Runner(stories260k_path, seq_len=256)
    s = ChatSession(r, template=ChatTemplate.LLAMA2)
    out1 = "".join(s.reply("Tell me about Lily", max_tokens=40))
    s.finish()
    pos1 = r.kv_cache_len()
    assert pos1 > 0
    out2 = "".join(s.reply("What happened next?", max_tokens=40))
    pos2 = r.kv_cache_len()
    assert pos2 > pos1  # cache persisted across turns
    assert isinstance(out1, str) and isinstance(out2, str)


def test_chat_session_context_overflow_restarts(stories260k_path):
    """A turn that can't fit restarts the session instead of corrupting the
    cache (the pre-fix behavior) or crashing the REPL."""
    r = Runner(stories260k_path, seq_len=64)
    s = ChatSession(r, template=ChatTemplate.LLAMA2)
    "".join(s.reply("Tell me a very long story about Lily"))  # fills cache
    assert r.kv_cache_len() >= 62
    out = "".join(s.reply("And then?", max_tokens=8))  # overflow -> restart
    assert r.kv_cache_len() < 62  # fresh session
    assert isinstance(out, str)
