"""Tokenizer facade + UTF-8 streaming decode buffer.

Mirrors crabml-core/src/tokenizer/mod.rs: one `Tokenizer` type dispatching to
the llama (SPM-greedy) or gpt2 (byte BPE) implementation, constructed from
GGUF metadata, plus `Utf8Buf` which buffers partial multi-byte characters so
streamed decoding never emits broken UTF-8.
"""

from __future__ import annotations

from .gpt2_bpe import Gpt2Tokenizer
from .llama_spm import LlamaTokenizer


class Utf8Buf:
    """Buffers undecodable byte prefixes across decode steps (mod.rs:113-153)."""

    def __init__(self):
        self.buf = bytearray()

    @staticmethod
    def _valid(b) -> bool:
        try:
            bytes(b).decode("utf-8")
            return True
        except UnicodeDecodeError:
            return False

    def step(self, data: bytes) -> str:
        data_valid = self._valid(data)
        self.buf.extend(data)
        if data_valid or self._valid(self.buf) or len(self.buf) >= 4:
            s = bytes(self.buf).decode("utf-8", errors="replace")
            self.buf.clear()
            return s
        return ""


class Tokenizer:
    def __init__(self, inner, tokens: list[str], eos_token: int):
        self._inner = inner
        self.tokens = tokens
        self.eos_token = eos_token

    @property
    def kind(self) -> str:
        return "llama" if isinstance(self._inner, LlamaTokenizer) else "gpt2"

    @property
    def bos_token(self) -> int:
        return self._inner.bos_token

    def vocab(self) -> list[str]:
        return self.tokens

    def token(self, token_id: int) -> str:
        return self.tokens[token_id]

    def encode(self, text: str, bos: bool = True, eos: bool = False) -> list[int]:
        return self._inner.encode(text, bos, eos, add_prefix_space=True)

    def decode_bytes(self, token: int) -> bytes:
        return self._inner.decode(token)

    def decode(self, token: int, decode_buf: Utf8Buf) -> str:
        return decode_buf.step(self._inner.decode(token))

    def decode_tokens(self, token_ids) -> str:
        buf = Utf8Buf()
        return "".join(self.decode(t, buf) for t in token_ids)

    @classmethod
    def new_llama(cls, tokens, scores, bos_token: int, eos_token: int) -> "Tokenizer":
        return cls(LlamaTokenizer(tokens, scores, bos_token, eos_token), tokens, eos_token)

    @classmethod
    def new_gpt2(
        cls, tokens, merges, bos_token: int, eos_token: int, special_tokens=None
    ) -> "Tokenizer":
        return cls(
            Gpt2Tokenizer(tokens, merges, bos_token, eos_token, special_tokens),
            tokens,
            eos_token,
        )


def special_tokens_from_metadata(metadata, tokens) -> list[str] | None:
    """Added-special tokens from `tokenizer.ggml.token_type` (CONTROL=3 and
    USER_DEFINED=4 entries) — the metadata-driven replacement for the
    reference's hardcoded list (tokenizer_gpt2.rs:101-118). Returns None
    when the key is absent so callers fall back to the heuristic list."""
    from .gpt2_bpe import TOKEN_TYPE_CONTROL, TOKEN_TYPE_USER_DEFINED

    types = metadata.get("tokenizer.ggml.token_type")
    if types is None:
        return None
    return [
        tokens[i]
        for i, t in enumerate(types)
        if int(t) in (TOKEN_TYPE_CONTROL, TOKEN_TYPE_USER_DEFINED) and i < len(tokens)
    ]


def tokenizer_from_hf_json(path: str) -> Tokenizer:
    """Build from a HuggingFace `tokenizer.json` (BPE models).

    The passthrough for models whose GGUF carries an incomplete tokenizer
    (or none): reads the vocab, merge list, and added special tokens from
    the HF file and builds the same byte-level BPE engine the gpt2 GGUF
    path uses. SentencePiece-model tokenizer.json files are not supported
    (use the GGUF metadata for those).
    """
    import json

    with open(path) as f:
        tj = json.load(f)
    model = tj.get("model", {})
    if model.get("type") != "BPE":
        from ..errors import UnsupportedError

        raise UnsupportedError(
            f"tokenizer.json model type {model.get('type')!r}: only BPE "
            "is supported (SentencePiece models load from GGUF metadata)"
        )
    vocab_map = model["vocab"]  # token -> id
    tokens = [None] * len(vocab_map)
    for t, i in vocab_map.items():
        tokens[i] = t
    added = tj.get("added_tokens", [])
    for a in added:  # added specials may sit beyond the base vocab
        i = a["id"]
        if i >= len(tokens):
            tokens.extend([None] * (i + 1 - len(tokens)))
        tokens[i] = a["content"]
    assert all(t is not None for t in tokens), "tokenizer.json has id gaps"
    merges = [
        m if isinstance(m, str) else " ".join(m) for m in model.get("merges", [])
    ]
    specials = [a["content"] for a in added if a.get("special", True)]
    ids = {t: i for i, t in enumerate(tokens)}
    bos, eos = _hf_bos_eos(tj, ids)
    return Tokenizer.new_gpt2(tokens, merges, bos, eos, specials)


def _hf_bos_eos(tj: dict, ids: dict) -> tuple[int, int]:
    """bos/eos read from the tokenizer.json itself, not guessed by name.

    Primary source: the post_processor's TemplateProcessing `single`
    template — the SpecialToken before the $A sequence is the bos the
    tokenizer actually prepends, the one after it the eos (nested
    "Sequence" processors are flattened). Falls back to a candidate-name
    scan over the file's declared special added_tokens only when no
    template exists (e.g. pure ByteLevel post-processing)."""
    procs = []

    def flatten(p):
        if not isinstance(p, dict):
            return
        if p.get("type") == "Sequence":
            for q in p.get("processors", []):
                flatten(q)
        else:
            procs.append(p)

    flatten(tj.get("post_processor") or {})
    for p in procs:
        if p.get("type") != "TemplateProcessing":
            continue
        bos = eos = None
        seen_seq = False
        for item in p.get("single", []):
            if "Sequence" in item:
                seen_seq = True
            elif "SpecialToken" in item:
                name = item["SpecialToken"].get("id")
                if name in ids:
                    if not seen_seq and bos is None:
                        bos = ids[name]
                    elif seen_seq and eos is None:
                        eos = ids[name]
        if bos is not None or eos is not None:
            fb, fe = _hf_bos_eos_fallback(tj, ids)
            return (bos if bos is not None else fb,
                    eos if eos is not None else fe)
    return _hf_bos_eos_fallback(tj, ids)


def _hf_bos_eos_fallback(tj: dict, ids: dict) -> tuple[int, int]:
    # restrict the name heuristic to tokens the file declares special
    special = {a["content"] for a in tj.get("added_tokens", [])
               if a.get("special", True)} or set(ids)
    bos = next((ids[c] for c in ("<s>", "<|begin_of_text|>", "<|endoftext|>")
                if c in ids and c in special), 0)
    eos = next((ids[c] for c in ("</s>", "<|end_of_text|>", "<|im_end|>",
                                 "<|endoftext|>") if c in ids and c in special), 0)
    return bos, eos


def tokenizer_from_gguf(metadata) -> Tokenizer:
    """Build from GGUF metadata keys (crabml-llama2/src/model.rs:494-551)."""
    tokens = list(metadata.get("tokenizer.ggml.tokens"))
    bos = metadata.get_int("tokenizer.ggml.bos_token_id")
    eos = metadata.get_int("tokenizer.ggml.eos_token_id")
    kind = metadata.get_str("tokenizer.ggml.model")
    if kind == "llama":
        scores = [float(s) for s in metadata.get("tokenizer.ggml.scores")]
        return Tokenizer.new_llama(tokens, scores, bos, eos)
    if kind == "gpt2":
        merges = list(metadata.get("tokenizer.ggml.merges"))
        specials = special_tokens_from_metadata(metadata, tokens)
        return Tokenizer.new_gpt2(tokens, merges, bos, eos, specials)
    from ..errors import UnsupportedError

    raise UnsupportedError(f"unsupported tokenizer model {kind!r}")
