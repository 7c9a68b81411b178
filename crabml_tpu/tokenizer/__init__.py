"""Tokenizers built from GGUF metadata.

Same capability surface as the reference (crabml-core/src/tokenizer/):
SentencePiece-style greedy merging for llama vocabularies, byte-level BPE for
gpt2 vocabularies (qwen2/llama3), and a UTF-8 streaming buffer for decoding
partial multi-byte characters across token boundaries.
"""

from .facade import (Tokenizer, Utf8Buf, tokenizer_from_gguf,  # noqa: F401
                     tokenizer_from_hf_json)
from .llama_spm import LlamaTokenizer  # noqa: F401
from .gpt2_bpe import Gpt2Tokenizer  # noqa: F401
