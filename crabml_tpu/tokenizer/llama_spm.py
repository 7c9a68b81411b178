"""SentencePiece-style greedy tokenizer for llama vocabularies.

Semantics match crabml-core/src/tokenizer/tokenizer_llama.rs: char-level
seeding with byte fallback (+3 offset past <unk>/<s>/</s>), then repeatedly
merge the adjacent pair whose merged token has the best score.
"""

from __future__ import annotations

SPM_SPACE = "▁"  # ▁


class LlamaTokenizer:
    def __init__(
        self,
        tokens: list[str],
        scores: list[float],
        bos_token: int,
        eos_token: int,
    ):
        self.tokens = tokens
        self.token_ids = {t: i for i, t in enumerate(tokens)}
        self.scores = list(scores)
        self.bos_token = bos_token
        self.eos_token = eos_token

    def decode(self, token: int) -> bytes:
        piece = self.tokens[token]
        # raw-byte tokens look like '<0x0A>' (tokenizer_llama.rs:38-58)
        if piece.startswith("<0x") and piece.endswith(">"):
            return bytes([int(piece[3:-1], 16)])
        if piece.startswith(SPM_SPACE):
            return piece.replace(SPM_SPACE, " ").encode("utf-8")
        return piece.encode("utf-8")

    def encode(
        self, text: str, bos: bool, eos: bool, add_prefix_space: bool = True
    ) -> list[int]:
        text = text.replace(" ", SPM_SPACE)
        out: list[int] = []
        if bos:
            out.append(self.bos_token)
        if add_prefix_space and text:
            dummy = self.token_ids.get(SPM_SPACE)
            if dummy is not None:
                out.append(dummy)

        for ch in text:
            tok = self.token_ids.get(ch)
            if tok is not None:
                out.append(tok)
            else:
                # byte fallback: bytes start at id 3 (tokenizer_llama.rs:95-100)
                out.extend(b + 3 for b in ch.encode("utf-8"))

        # greedy best-score adjacent merge
        while True:
            best_score = float("-inf")
            best_idx = -1
            best_token = -1
            for i in range(len(out) - 1):
                merged = self.tokens[out[i]] + self.tokens[out[i + 1]]
                tok = self.token_ids.get(merged)
                if tok is not None and self.scores[tok] > best_score:
                    best_score = self.scores[tok]
                    best_idx = i
                    best_token = tok
            if best_idx < 0:
                break
            out[best_idx] = best_token
            del out[best_idx + 1]

        if eos:
            out.append(self.eos_token)
        return out
