"""Typed error taxonomy (reference ErrorKind parity, error.rs:5-33):
engine-diagnosed failures are CrabmlError subclasses AND keep their
idiomatic Python bases, so both catch styles work."""

import pytest

from crabml_tpu.errors import (CacheError, CrabmlError, FormatError,
                               TokenizeError, UnsupportedError)


def test_gguf_error_is_format_error(tmp_path):
    from crabml_tpu.gguf.reader import GGUFError, GGUFFile

    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(FormatError):
        GGUFFile(str(p))
    with pytest.raises(CrabmlError):
        GGUFFile(str(p))
    with pytest.raises(ValueError):  # idiomatic base preserved
        GGUFFile(str(p))
    assert issubclass(GGUFError, FormatError)


def test_unsupported_architecture():
    from crabml_tpu.models.config import config_from_gguf

    class MD:
        def get_str(self, k, d=""):
            return "notanarch" if k == "general.architecture" else d

    with pytest.raises(UnsupportedError):
        config_from_gguf(MD())


def test_cache_full_is_cache_error(stories260k_path):
    from crabml_tpu.runtime.runner import Runner

    r = Runner(stories260k_path, seq_len=16)
    r.pos = r.pos + 15
    with pytest.raises(CacheError):
        r._forward_tokens([1, 2, 3])
