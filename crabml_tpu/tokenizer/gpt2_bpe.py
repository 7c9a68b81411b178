"""Byte-level BPE tokenizer for gpt2-style vocabularies (qwen2, llama3).

Semantics match crabml-core/src/tokenizer/tokenizer_gpt2.rs: bytes are mapped
through the gpt2 byte→unicode table, special tokens are split out before BPE,
and adjacent pairs merge in ascending merge-rank order.
"""

from __future__ import annotations

import re


def build_byte_encode_map() -> dict[int, str]:
    """gpt2's printable-byte remapping (tokenizer_gpt2.rs:178-194)."""
    m: dict[int, str] = {}
    ranges = [(ord("!"), ord("~")), (ord("¡"), ord("¬")), (ord("®"), ord("ÿ"))]
    for start, end in ranges:
        for i in range(start, end + 1):
            m[i] = chr(i)
    extra = 256
    for i in range(256):
        if i not in m:
            m[i] = chr(extra)
            extra += 1
    return m


# FALLBACK ONLY, for GGUFs missing tokenizer.ggml.token_type metadata.
# The reference hardcodes this list (tokenizer_gpt2.rs:101-118), which
# silently mis-tokenizes any model with other added specials (qwen2.5 tool
# tokens, llama3.1 extras); we read the metadata when present.
SPECIAL_TOKENS = [
    # qwen2
    "<|im_start|>",
    "<|im_end|>",
    "<|endoftext|>",
    # llama3
    "<|begin_of_text|>",
    "<|end_of_text|>",
    "<|reserved_special_token_0|>",
    "<|reserved_special_token_1|>",
    "<|reserved_special_token_2|>",
    "<|reserved_special_token_3|>",
    "<|start_header_id|>",
    "<|end_header_id|>",
    "<|reserved_special_token_4|>",
    "<|eot_id|>",
]

# tokenizer.ggml.token_type values (llama.cpp llama_token_type)
TOKEN_TYPE_NORMAL = 1
TOKEN_TYPE_UNKNOWN = 2
TOKEN_TYPE_CONTROL = 3
TOKEN_TYPE_USER_DEFINED = 4
TOKEN_TYPE_UNUSED = 5
TOKEN_TYPE_BYTE = 6


class Gpt2Tokenizer:
    def __init__(
        self,
        tokens: list[str],
        merges: list[str],
        bos_token: int,
        eos_token: int,
        special_tokens: list[str] | None = None,
    ):
        self.tokens = tokens
        self.token_ids = {t: i for i, t in enumerate(tokens)}
        self.bpe_ranks: dict[tuple[int, int], int] = {}
        for rank, line in enumerate(merges):
            a, b = line.split(" ")
            self.bpe_ranks[(self.token_ids[a], self.token_ids[b])] = rank
        self.byte_encodes = build_byte_encode_map()
        self.byte_decodes = {c: b for b, c in self.byte_encodes.items()}
        self.bos_token = bos_token
        self.eos_token = eos_token
        if special_tokens is None:  # no metadata: reference-parity fallback
            special_tokens = [t for t in SPECIAL_TOKENS if t in self.token_ids]
        # longest-first so overlapping specials match maximally
        self.special_tokens = sorted(set(special_tokens), key=len, reverse=True)
        self._special_set = set(self.special_tokens)
        self._special_re = (
            re.compile("(" + "|".join(re.escape(k) for k in self.special_tokens) + ")")
            if self.special_tokens
            else None
        )

    def decode(self, token_id: int) -> bytes:
        token = self.tokens[token_id]
        out = bytearray()
        for ch in token:
            b = self.byte_decodes.get(ch)
            if b is not None:
                out.append(b)
            else:
                out.extend(ch.encode("utf-8"))
        return bytes(out)

    def encode(
        self, text: str, bos: bool, eos: bool, add_prefix_space: bool = True
    ) -> list[int]:
        if add_prefix_space:
            text = " " + text
        out: list[int] = []
        parts = self._special_re.split(text) if self._special_re else [text]
        for part in parts:
            if not part:
                continue
            if part in self._special_set:
                tok = self.token_ids.get(part)
                if tok is not None:
                    out.append(tok)
                continue
            seed = [
                self.token_ids[self.byte_encodes[b]] for b in part.encode("utf-8")
            ]
            out.extend(self._bpe_merge(seed))
        if bos:
            out.insert(0, self.bos_token)
        if eos:
            out.append(self.eos_token)
        return out

    def _bpe_merge(self, toks: list[int]) -> list[int]:
        while True:
            best_rank = None
            best_idx = -1
            for i in range(len(toks) - 1):
                rank = self.bpe_ranks.get((toks[i], toks[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_idx = i
            if best_idx < 0:
                return toks
            merged = self.tokens[toks[best_idx]] + self.tokens[toks[best_idx + 1]]
            toks[best_idx] = self.token_ids[merged]
            del toks[best_idx + 1]
