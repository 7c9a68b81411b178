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


def test_apply_messages_multiturn_chatml():
    from crabml_tpu.runtime.chat import ChatTemplate

    msgs = [
        {"role": "system", "content": "Be brief."},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "bye"},
    ]
    got = ChatTemplate.CHATML.apply_messages(msgs)
    assert got == (
        "<|im_start|>system\nBe brief.<|im_end|>"
        "<|im_start|>user\nhi<|im_end|>"
        "<|im_start|>assistant\nhello<|im_end|>"
        "<|im_start|>user\nbye<|im_end|>"
        "<|im_start|>assistant\n"
    )


def test_apply_messages_all_formats_end_with_generation_prefix():
    from crabml_tpu.runtime.chat import ChatTemplate

    msgs = [{"role": "user", "content": "hi"}]
    assert ChatTemplate.LLAMA2.apply_messages(msgs).endswith("[/INST]")
    assert ChatTemplate.LLAMA3.apply_messages(msgs).endswith(
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    assert ChatTemplate.GEMMA.apply_messages(msgs).endswith("<start_of_turn>model\n")
    assert ChatTemplate.CHATML.apply_messages(msgs).endswith(
        "<|im_start|>assistant\n"
    )
    # single-turn render agrees with the legacy apply() for llama3
    assert ChatTemplate.LLAMA3.apply_messages(msgs) == ChatTemplate.LLAMA3.apply("hi")


def test_render_messages_jinja_template():
    """A GGUF-carried HF Jinja template renders exactly, with bos/eos vars."""
    from crabml_tpu.models.config import ModelConfig
    from crabml_tpu.runtime.chat import render_messages

    tmpl = (
        "{{ bos_token }}{% for m in messages %}"
        "<|im_start|>{{ m.role }}\n{{ m.content }}<|im_end|>\n"
        "{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
    )
    cfg = ModelConfig(model_name="m", architecture="llama", chat_template=tmpl)

    class Tok:
        tokens = ["<s>", "</s>"]
        bos_token = 0
        eos_token = 1

    text, stop = render_messages(
        cfg, [{"role": "user", "content": "hi"}], Tok()
    )
    assert text == "<s><|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
    assert stop == "<|im_end|>"  # heuristic reads the template content


def test_render_messages_rejects_bad_roles():
    import pytest

    from crabml_tpu.models.config import ModelConfig
    from crabml_tpu.runtime.chat import render_messages

    cfg = ModelConfig(model_name="m", architecture="llama")
    with pytest.raises(ValueError):
        render_messages(cfg, [{"role": "tool", "content": "x"}])
    with pytest.raises(ValueError):
        render_messages(cfg, [{"role": "user", "content": 3}])


def test_render_messages_jinja_raise_exception():
    import pytest

    from crabml_tpu.models.config import ModelConfig
    from crabml_tpu.runtime.chat import render_messages

    cfg = ModelConfig(
        model_name="m", architecture="llama",
        chat_template="{{ raise_exception('only user roles') }}",
    )
    with pytest.raises(ValueError, match="only user roles"):
        render_messages(cfg, [{"role": "user", "content": "hi"}])


CHATML_JINJA = (
    "{% for m in messages %}"
    "<|im_start|>{{ m.role }}\n{{ m.content }}<|im_end|>\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)


def _jinja_runner(path, seq_len=192):
    import dataclasses

    from crabml_tpu.runtime.runner import Runner

    r = Runner(path, seq_len=seq_len)
    r.cfg = dataclasses.replace(r.cfg, chat_template=CHATML_JINJA)
    return r


def test_chat_session_jinja_incremental(stories260k_path):
    from crabml_tpu.runtime.chat import ChatSession

    r = _jinja_runner(stories260k_path)
    sess = ChatSession(r, system_prompt="You tell stories.")
    assert sess._jinja
    r1 = "".join(sess.reply("hi", max_tokens=6))
    assert isinstance(r1, str)
    len1 = r.kv_cache_len()
    assert len1 > 0
    assert [m["role"] for m in sess.messages] == ["system", "user", "assistant"]
    # turn 1 closed exactly as the template writes it
    assert sess._rendered.endswith("<|im_end|>\n")
    r2 = "".join(sess.reply("more", max_tokens=6))
    len2 = r.kv_cache_len()
    assert len2 > len1  # incremental: cache grew, no restart
    assert [m["role"] for m in sess.messages] == [
        "system", "user", "assistant", "user", "assistant",
    ]
    # the next-turn render extends what the cache holds (append-only)
    full, _ = sess._render(add_generation_prompt=True)
    assert full.startswith(sess._rendered.rstrip("\n")[:40])


def test_chat_session_jinja_overflow_restarts(stories260k_path):
    from crabml_tpu.runtime.chat import ChatSession

    r = _jinja_runner(stories260k_path, seq_len=64)
    sess = ChatSession(r)
    for _ in range(4):  # overflow the 64-token cache across turns
        out = "".join(sess.reply("tell me a very long story now", max_tokens=8))
        assert isinstance(out, str)
    # session survived; history was truncated on restart, not corrupted
    assert r.kv_cache_len() <= 64
    assert sess.messages[-1]["role"] == "assistant"
