"""Typed error taxonomy — the analogue of the reference's ErrorKind
(crabml-core/src/error.rs:5-33: IOError, BadInput, Unsupported, TensorError,
TokenizeError, ...).

All engine-raised errors derive from CrabmlError; each subclass keeps its
idiomatic Python base (ValueError/OSError) so existing `except ValueError`
call sites keep working. `except CrabmlError` catches everything the engine
itself diagnoses while letting genuine bugs (TypeError etc.) propagate.
"""

from __future__ import annotations


class CrabmlError(Exception):
    """Base of every engine-diagnosed error."""


class FormatError(CrabmlError, ValueError):
    """Malformed GGUF container / payload (reference: BadInput)."""


class UnsupportedError(CrabmlError, ValueError):
    """Valid input the engine doesn't implement (reference: Unsupported):
    unknown architecture, tokenizer model, quant scheme, ..."""


class TokenizeError(CrabmlError, ValueError):
    """Tokenizer construction/usage errors (reference: TokenizeError)."""


class CacheError(CrabmlError, ValueError):
    """KV-cache state errors: cache full, shape mismatch on restore."""


class ConfigError(CrabmlError, ValueError):
    """Invalid engine/runtime configuration (bad flag combinations,
    sharding that can't split the model, ...)."""
