"""Tokenizer tests — encode/decode round-trips per the reference test vectors
(tokenizer_llama.rs:145-206) adapted to the committed 260k vocabulary, plus
gpt2 BPE unit tests on a synthetic vocab and Utf8Buf streaming."""

import pytest

from crabml_tpu.gguf import GGUFFile
from crabml_tpu.tokenizer import Gpt2Tokenizer, Tokenizer, Utf8Buf, tokenizer_from_gguf


@pytest.fixture(scope="module")
def tk260(stories260k_path):
    gf = GGUFFile(stories260k_path)
    return tokenizer_from_gguf(gf.metadata)


def pieces(tk, ids):
    return " - ".join(tk.token(t) for t in ids)


def test_encode_basic(tk260):
    ids = tk260.encode("Lily is a cat", bos=True, eos=True)
    s = pieces(tk260, ids)
    assert s.startswith("<s> - ▁Lily - ")
    assert s.endswith(" - </s>")
    # round-trip decode
    text = tk260.decode_tokens(ids[1:-1])
    assert text == " Lily is a cat"


def test_encode_byte_fallback(tk260):
    # 'Z' is in this tiny vocab; use a char that's not: emoji → utf-8 byte tokens (+3)
    ids = tk260.encode("🦀", bos=False, eos=False)
    emoji = "🦀".encode("utf-8")
    # after the dummy prefix token, expect 4 byte-fallback tokens
    assert ids[-4:] == [b + 3 for b in emoji]
    assert tk260.decode_tokens(ids).endswith("🦀")


def test_greedy_merge_prefers_best_score(tk260):
    # "little" should merge into ▁little (present in vocab) not stay char-level
    ids = tk260.encode("a little time", bos=False, eos=False)
    assert "▁little" in pieces(tk260, ids)
    assert "▁time" in pieces(tk260, ids)


def test_decode_streams_partial_utf8(tk260):
    ids = tk260.encode("é…", bos=False, eos=False)
    buf = Utf8Buf()
    out = "".join(tk260.decode(t, buf) for t in ids)
    assert "é" in out and "…" in out


def test_utf8buf_partial_flush():
    buf = Utf8Buf()
    euro = "€".encode("utf-8")  # 3 bytes
    assert buf.step(euro[0:1]) == ""
    assert buf.step(euro[1:2]) == ""
    assert buf.step(euro[2:3]) == "€"


def test_utf8buf_invalid_flushes_at_4():
    buf = Utf8Buf()
    assert buf.step(b"\xff") == ""
    assert buf.step(b"\xff") == ""
    assert buf.step(b"\xff") == ""
    out = buf.step(b"\xff")
    assert len(out) == 4  # replacement chars


def _toy_gpt2():
    # vocab covering bytes for "hello world" plus merged tokens
    from crabml_tpu.tokenizer.gpt2_bpe import build_byte_encode_map

    bem = build_byte_encode_map()
    chars = sorted({bem[b] for b in " helowrd".encode("utf-8")})
    vocab = chars + ["he", "ll", "hell", "hello", "Ġw", "Ġwor", "Ġworld", "or", "ld"]
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "o r", "l d", "Ġw or", "Ġwor ld"]
    # 'Ġ' is the gpt2 encoding of space (0x20 -> U+0120)
    assert bem[0x20] == "Ġ"
    return Gpt2Tokenizer(vocab, merges, bos_token=0, eos_token=1)


def test_gpt2_bpe_merge_order():
    tk = _toy_gpt2()
    ids = tk.encode("hello world", bos=False, eos=False, add_prefix_space=False)
    toks = [tk.tokens[i] for i in ids]
    assert toks == ["hello", "Ġworld"]


def test_gpt2_decode_roundtrip():
    tk = _toy_gpt2()
    ids = tk.encode("hello world", bos=False, eos=False, add_prefix_space=False)
    data = b"".join(tk.decode(i) for i in ids)
    assert data == b"hello world"


def test_gpt2_special_tokens_not_split():
    from crabml_tpu.tokenizer.gpt2_bpe import build_byte_encode_map

    bem = build_byte_encode_map()
    chars = [bem[b] for b in range(33, 127)]
    vocab = sorted(set(chars)) + ["<|im_start|>", "<|im_end|>"]
    tk = Gpt2Tokenizer(vocab, [], bos_token=0, eos_token=1)
    ids = tk.encode("<|im_start|>hi<|im_end|>", bos=False, eos=False, add_prefix_space=False)
    toks = [tk.tokens[i] for i in ids]
    assert toks[0] == "<|im_start|>"
    assert toks[-1] == "<|im_end|>"
    assert "".join(toks[1:-1]) == "hi"


def test_gpt2_specials_from_metadata_roundtrip(tmp_path):
    """tokenizer.ggml.token_type CONTROL/USER_DEFINED entries become the
    special set — a qwen2.5-style added special ABSENT from the reference's
    hardcoded list (tokenizer_gpt2.rs:101-118) must still round-trip."""
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.gguf.writer import GGUFWriter
    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.quant.codecs import quantize
    from crabml_tpu.tokenizer.gpt2_bpe import build_byte_encode_map
    import numpy as np

    bem = build_byte_encode_map()
    chars = [bem[b] for b in range(33, 127)]
    vocab = sorted(set(chars)) + ["<tool_call>", "</tool_call>", "<|im_end|>"]
    n = len(vocab)
    # token_type: specials are CONTROL(3); everything else NORMAL(1)
    types = [1] * (n - 3) + [3, 3, 3]

    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("llama.context_length", 64)
    w.add_metadata("llama.embedding_length", 32)
    w.add_metadata("llama.feed_forward_length", 64)
    w.add_metadata("llama.block_count", 1)
    w.add_metadata("llama.attention.head_count", 2)
    w.add_metadata("llama.attention.head_count_kv", 2)
    w.add_metadata("llama.rope.dimension_count", 16)
    w.add_metadata("tokenizer.ggml.model", "gpt2")
    w.add_metadata("tokenizer.ggml.tokens", vocab)
    w.add_metadata("tokenizer.ggml.merges", [])
    w.add_metadata("tokenizer.ggml.token_type", types)
    w.add_metadata("tokenizer.ggml.bos_token_id", 0)
    w.add_metadata("tokenizer.ggml.eos_token_id", 1)
    path = str(tmp_path / "specials.gguf")
    w.write(path)

    tk = tokenizer_from_gguf(GGUFFile(path).metadata)
    ids = tk._inner.encode("<tool_call>hi</tool_call>", bos=False, eos=False,
                           add_prefix_space=False)
    toks = [tk.tokens[i] for i in ids]
    assert toks[0] == "<tool_call>"
    assert toks[-1] == "</tool_call>"
    assert "".join(toks[1:-1]) == "hi"
    # the hardcoded-list fallback would NOT know <tool_call>
    tk_fallback = Gpt2Tokenizer(vocab, [], bos_token=0, eos_token=1)
    ids_fb = tk_fallback.encode("<tool_call>hi", bos=False, eos=False,
                                add_prefix_space=False)
    assert tk_fallback.tokens[ids_fb[0]] != "<tool_call>"


def test_gpt2_metadata_specials_longest_match():
    """Overlapping specials must match longest-first."""
    from crabml_tpu.tokenizer.gpt2_bpe import build_byte_encode_map

    bem = build_byte_encode_map()
    chars = [bem[b] for b in range(33, 127)]
    vocab = sorted(set(chars)) + ["<|a|>", "<|a|>x"]
    tk = Gpt2Tokenizer(vocab, [], 0, 1, special_tokens=["<|a|>", "<|a|>x"])
    ids = tk.encode("<|a|>x", bos=False, eos=False, add_prefix_space=False)
    assert [tk.tokens[i] for i in ids] == ["<|a|>x"]


def test_hf_tokenizer_json_passthrough(tmp_path):
    """ROADMAP #9: build the BPE engine from a HuggingFace tokenizer.json
    (vocab + merges + added specials) and round-trip text + specials."""
    import json

    from crabml_tpu.tokenizer import tokenizer_from_hf_json
    from crabml_tpu.tokenizer.gpt2_bpe import build_byte_encode_map

    bem = build_byte_encode_map()
    chars = sorted({bem[b] for b in range(33, 127)} | {bem[0x20]})
    vocab = {c: i for i, c in enumerate(chars)}
    he = len(vocab); vocab["he"] = he
    ll = len(vocab); vocab["ll"] = ll
    hell = len(vocab); vocab["hell"] = hell
    n0 = len(vocab)
    tj = {
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": ["h e", "l l", "he ll"],
        },
        "added_tokens": [
            {"id": n0, "content": "<|special|>", "special": True},
            {"id": n0 + 1, "content": "</s>", "special": True},
        ],
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(tj))

    tk = tokenizer_from_hf_json(str(p))
    ids = tk._inner.encode("<|special|>hello", bos=False, eos=False,
                           add_prefix_space=False)
    toks = [tk.tokens[i] for i in ids]
    assert toks[0] == "<|special|>"
    assert toks[1] == "hell"  # merges applied in rank order
    assert "".join(toks[1:]) == "hello"
    assert tk.eos_token == n0 + 1


def test_hf_bos_eos_from_post_processor(tmp_path):
    """VERDICT r2 #9: bos/eos come from the file's TemplateProcessing
    post-processor, not from a hardcoded candidate-name list — a model
    naming them <BOS>/<EOS> must resolve correctly."""
    import json

    from crabml_tpu.tokenizer import tokenizer_from_hf_json
    from crabml_tpu.tokenizer.gpt2_bpe import build_byte_encode_map

    bem = build_byte_encode_map()
    chars = sorted({bem[b] for b in range(33, 127)} | {bem[0x20]})
    vocab = {c: i for i, c in enumerate(chars)}
    n0 = len(vocab)
    tj = {
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "added_tokens": [
            # decoys the old name heuristic would have picked:
            {"id": n0, "content": "<s>", "special": True},
            {"id": n0 + 1, "content": "</s>", "special": True},
            {"id": n0 + 2, "content": "<BOS>", "special": True},
            {"id": n0 + 3, "content": "<EOS>", "special": True},
        ],
        "post_processor": {
            "type": "Sequence",
            "processors": [
                {"type": "ByteLevel"},
                {
                    "type": "TemplateProcessing",
                    "single": [
                        {"SpecialToken": {"id": "<BOS>", "type_id": 0}},
                        {"Sequence": {"id": "A", "type_id": 0}},
                        {"SpecialToken": {"id": "<EOS>", "type_id": 0}},
                    ],
                },
            ],
        },
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(tj))
    tk = tokenizer_from_hf_json(str(p))
    assert tk.bos_token == n0 + 2
    assert tk.eos_token == n0 + 3

    # no template -> fallback still restricted to declared specials
    tj2 = {
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "added_tokens": [
            {"id": n0, "content": "<|im_end|>", "special": True},
        ],
    }
    p2 = tmp_path / "t2.json"
    p2.write_text(json.dumps(tj2))
    tk2 = tokenizer_from_hf_json(str(p2))
    assert tk2.eos_token == n0


def test_spm_roundtrip_fuzz(tk260):
    """Hypothesis: encode→decode roundtrips arbitrary unicode exactly
    (byte fallback covers anything outside the vocab; Utf8Buf reassembles
    split multibyte sequences). The reference pins this only on
    hand-picked strings (tokenizer_llama.rs:145-206)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crabml_tpu.tokenizer import Utf8Buf

    @settings(max_examples=150, deadline=None)
    @given(st.text(min_size=1, max_size=60))
    def roundtrip(s):
        ids = tk260.encode(s, bos=False)
        buf = Utf8Buf()
        out = "".join(tk260.decode(t, buf) for t in ids)
        # SPM prepends one space at encode time (the ▁ convention);
        # everything else must round-trip byte-exactly
        assert out == " " + s or out == s

    roundtrip()
