"""GGUF reader/writer tests.

Mirrors the reference's format/golden-file test strategy
(crabml-core/src/gguf.rs:839-990): exact tensor names/shapes/dtypes and exact
metadata values against the committed 260k fixture, plus writer round-trips.
"""

import numpy as np
import pytest

from crabml_tpu.gguf import GGMLType, GGUFFile, GGUFWriter
from crabml_tpu.quant import dequantize, quantize


def test_load_tensors_260k(stories260k_path):
    gf = GGUFFile(stories260k_path)
    assert len(gf.tensor_infos) == 48
    t0 = gf.tensor_infos[0]
    assert t0.name == "token_embd.weight"
    assert len(bytes(t0.data)) == 131072
    assert t0.typ == GGMLType.F32
    assert t0.dimensions == (64, 512)
    assert t0.shape == (512, 64)
    assert all(i.typ == GGMLType.F32 for i in gf.tensor_infos)

    # spot-check the full inventory shape table (gguf.rs:863-912)
    by_name = {i.name: i for i in gf.tensor_infos}
    assert by_name["blk.0.attn_q.weight"].dimensions == (64, 64)
    assert by_name["blk.0.attn_k.weight"].dimensions == (64, 32)
    assert by_name["blk.3.ffn_gate.weight"].dimensions == (64, 172)
    assert by_name["blk.4.ffn_down.weight"].dimensions == (172, 64)
    assert by_name["output_norm.weight"].dimensions == (64,)
    assert by_name["output.weight"].dimensions == (64, 512)


def test_load_metadata_260k(stories260k_path):
    gf = GGUFFile(stories260k_path)
    assert gf.architecture == "llama"
    assert gf.alignment == 32
    md = gf.metadata
    assert md.get_str("general.name") == "tinyllamas-stories-260k"
    assert md.get_int("llama.attention.head_count") == 8
    assert md.get_int("llama.attention.head_count_kv") == 4
    assert md.get_float("llama.attention.layer_norm_rms_epsilon") == pytest.approx(1e-5)
    assert md.get_int("llama.block_count") == 5
    assert md.get_int("llama.context_length") == 512
    assert md.get_int("llama.embedding_length") == 64
    assert md.get_int("llama.feed_forward_length") == 172
    assert md.get_int("llama.rope.dimension_count") == 8
    assert md.get_int("tokenizer.ggml.bos_token_id") == 1
    assert md.get_int("tokenizer.ggml.eos_token_id") == 2
    assert md.get_str("tokenizer.ggml.model") == "llama"
    tokens = md.get("tokenizer.ggml.tokens")
    assert len(tokens) == 512
    assert tokens[:3] == ["<unk>", "<s>", "</s>"]
    assert tokens[259] == "▁t"
    assert tokens[261] == "▁a"
    scores = md.get("tokenizer.ggml.scores")
    assert scores.dtype == np.float32
    assert scores[-1] == -252.0


def test_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.name", "roundtrip-test")
    w.add_metadata("llama.block_count", 2)
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata("tokenizer.ggml.tokens", ["<unk>", "<s>", "</s>", "hello"])
    w.add_metadata("tokenizer.ggml.scores", np.array([0, 0, 0, -1], np.float32))
    w.add_metadata("some.bool", True)
    w.add_metadata("some.i32.array", [1, -2, 3])

    a = rng.standard_normal((8, 64), dtype=np.float32)
    b = rng.standard_normal((4, 256), dtype=np.float32)
    w.add_tensor("a.weight", GGMLType.F32, a.shape, quantize(GGMLType.F32, a))
    w.add_tensor("b.weight", GGMLType.Q8_0, b.shape, quantize(GGMLType.Q8_0, b))

    path = tmp_path / "rt.gguf"
    w.write(str(path))

    gf = GGUFFile(path)
    assert gf.architecture == "llama"
    assert gf.metadata.get_int("llama.block_count") == 2
    assert gf.metadata.get("some.bool") is True
    assert list(gf.metadata.get("some.i32.array")) == [1, -2, 3]
    assert gf.metadata.get("tokenizer.ggml.tokens") == ["<unk>", "<s>", "</s>", "hello"]

    ia = gf.get_tensor_info("a.weight")
    assert ia.shape == (8, 64)
    assert ia.dimensions == (64, 8)
    got = dequantize(GGMLType.F32, bytes(ia.data)).reshape(8, 64)
    np.testing.assert_array_equal(got, a)

    ib = gf.get_tensor_info("b.weight")
    assert ib.typ == GGMLType.Q8_0
    deq = dequantize(GGMLType.Q8_0, bytes(ib.data)).reshape(4, 256)
    assert np.abs(deq - b).max() < 0.05  # q8 round-trip error


def test_alignment_respected(tmp_path):
    w = GGUFWriter(alignment=64)
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.alignment", 64)
    x = np.ones((1, 32), np.float32)
    w.add_tensor("x", GGMLType.F32, x.shape, quantize(GGMLType.F32, x))
    w.add_tensor("y", GGMLType.F32, x.shape, quantize(GGMLType.F32, x))
    p = tmp_path / "a.gguf"
    w.write(str(p))
    gf = GGUFFile(p)
    assert gf.alignment == 64
    assert gf.get_tensor_info("y").offset % 64 == 0
    np.testing.assert_array_equal(
        dequantize(GGMLType.F32, bytes(gf.get_tensor_info("y").data)), x.reshape(-1)
    )


class TestMalformedFiles:
    """Fuzz-lite: corrupt containers must raise GGUFError, never crash or
    silently misparse (ROADMAP #9; the reference has no such tests)."""

    def _write(self, tmp_path, data: bytes) -> str:
        p = tmp_path / "bad.gguf"
        p.write_bytes(data)
        return str(p)

    def test_bad_magic(self, tmp_path):
        import pytest

        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        path = self._write(tmp_path, b"NOPE" + b"\x00" * 60)
        with pytest.raises(GGUFError):
            GGUFFile(path)

    def test_bad_version(self, tmp_path):
        import struct

        import pytest

        from crabml_tpu.gguf.constants import GGUF_MAGIC
        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        path = self._write(tmp_path, struct.pack("<II", GGUF_MAGIC, 99) + b"\x00" * 32)
        with pytest.raises(GGUFError):
            GGUFFile(path)

    def test_truncated_header(self, tmp_path, stories260k_path):
        import pytest

        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        blob = open(stories260k_path, "rb").read()[:100]
        path = self._write(tmp_path, blob)
        with pytest.raises(GGUFError):
            GGUFFile(path)

    def test_truncated_tensor_data(self, tmp_path, stories260k_path):
        import pytest

        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        blob = open(stories260k_path, "rb").read()
        path = self._write(tmp_path, blob[: len(blob) // 2])
        with pytest.raises(GGUFError):
            GGUFFile(path)

    def test_insane_kv_count(self, tmp_path):
        import struct

        import pytest

        from crabml_tpu.gguf.constants import GGUF_MAGIC
        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        # v3 header claiming 2^60 metadata keys
        hdr = struct.pack("<IIQQ", GGUF_MAGIC, 3, 0, 1 << 60)
        path = self._write(tmp_path, hdr + b"\x00" * 64)
        with pytest.raises(GGUFError):
            GGUFFile(path)


class TestFuzzHypothesis:
    """Property-based fuzzing of the container parser (hypothesis):
    arbitrary byte mutations and truncations of a valid file must raise
    GGUFError (or parse), never crash, hang, or return garbage silently.
    Neither the reference nor round 1 had generative fuzzing."""

    @staticmethod
    def _tiny_gguf_bytes(tmp_path):
        import numpy as np

        from crabml_tpu.gguf.constants import GGMLType
        from crabml_tpu.gguf.writer import GGUFWriter

        w = GGUFWriter()
        w.add_metadata("general.architecture", "llama")
        w.add_metadata("llama.block_count", 1)
        w.add_metadata("tokenizer.ggml.tokens", ["a", "b"])
        w.add_tensor("t.weight", GGMLType.F32, (4, 8),
                     np.arange(32, dtype=np.float32).tobytes())
        p = tmp_path / "fuzz-base.gguf"
        w.write(str(p))
        return p.read_bytes()

    def test_byte_mutations_never_crash(self, tmp_path):
        from hypothesis import given, settings, strategies as st

        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        base = self._tiny_gguf_bytes(tmp_path)

        @settings(max_examples=200, deadline=None)
        @given(
            pos=st.integers(0, len(base) - 1),
            val=st.integers(0, 255),
            data=st.data(),
        )
        def check(pos, val, data):
            mutated = bytearray(base)
            mutated[pos] = val
            # sometimes also truncate
            if data.draw(st.booleans()):
                mutated = mutated[: data.draw(st.integers(0, len(mutated)))]
            p = tmp_path / "fuzz-mut.gguf"
            p.write_bytes(bytes(mutated))
            try:
                gf = GGUFFile(str(p))
                # if it parsed, reading every tensor must stay in-bounds
                for info in gf.tensor_infos:
                    _ = bytes(info.to_numpy()[:8])
            except (GGUFError, ValueError, KeyError, UnicodeDecodeError):
                pass  # typed rejection is the contract

        check()

    def test_random_headers_never_crash(self, tmp_path):
        import struct

        from hypothesis import given, settings, strategies as st

        from crabml_tpu.gguf.constants import GGUF_MAGIC
        from crabml_tpu.gguf.reader import GGUFError, GGUFFile

        @settings(max_examples=150, deadline=None)
        @given(
            version=st.integers(0, 2**32 - 1),
            n_tensors=st.integers(0, 2**63 - 1),
            n_kv=st.integers(0, 2**63 - 1),
            tail=st.binary(max_size=64),
        )
        def check(version, n_tensors, n_kv, tail):
            blob = struct.pack("<IIQQ", GGUF_MAGIC, version, n_tensors, n_kv) + tail
            p = tmp_path / "fuzz-hdr.gguf"
            p.write_bytes(blob)
            try:
                GGUFFile(str(p))
            except (GGUFError, ValueError, KeyError, UnicodeDecodeError):
                pass

        check()
