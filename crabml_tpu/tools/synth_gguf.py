"""Construct FULL-SIZE synthetic GGUF files on disk.

No multi-GB real checkpoint can be downloaded in this environment, so the
honest way to exercise the real model path — mmap -> native repack -> load ->
generate, the reference's whole identity (gguf.rs:789-833, model.rs:183-198)
— is to build a byte-valid llama-7B-shaped GGUF with pseudo-random weights
and run it through the exact same code a user's Mistral-7B file would take.
The weights are synthesized AND quantized inside the native library
(crabml_synth_quantize), so a 3.6 GB Q4_K file builds in minutes on one core
without materializing 27 GB of f32 on the host.

Usage:
    python -m crabml_tpu.tools.synth_gguf out.gguf --model 7b --quant q4_k
"""

from __future__ import annotations

import argparse
import struct
import time

import numpy as np

from .. import native
from ..gguf.constants import GGMLType, GGML_BLOCK_SIZES
from ..gguf.writer import GGUFWriter, _pack_str, _pack_value, _value_type_of
from ..gguf.constants import GGUF_MAGIC, GGUFValueType


MODEL_SHAPES = {
    # (dim, hidden, layers, heads, kv_heads, vocab, ctx)
    # 7b = Mistral-7B shape (GQA kv 8, ffn 14336) — BASELINE.json's target
    # config and the shape every kernel number is quoted against
    "7b": (4096, 14336, 32, 32, 8, 32000, 4096),
    # llama1/2-7B classic shape (MHA, ffn 11008)
    "7b-mha": (4096, 11008, 32, 32, 32, 32000, 4096),
    "13b": (5120, 13824, 40, 40, 40, 32000, 4096),
    "1b": (2048, 5632, 22, 32, 4, 32000, 4096),
    "tiny": (256, 512, 4, 4, 2, 512, 512),  # K-quant-compatible rows (k % 256)
    # mixtral-shaped MoE sized for one 16 GB chip at Q4_K (~2.6 GB)
    "mixtral": (2048, 5632, 16, 16, 8, 32000, 4096),
}

# model -> (n_experts, n_experts_used); absent = dense FFN
MODEL_EXPERTS = {"mixtral": (8, 2)}


def _synth_tokenizer(vocab: int):
    """A llama-SPM vocab: specials + 256 byte tokens + synthetic pieces.
    Real text tokenizes via byte fallback; decode round-trips."""
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    i = 0
    while len(tokens) < vocab:
        tokens.append(f"▁w{i}")
        i += 1
    scores = [0.0] * 3 + [0.0] * 256 + [-float(j) for j in range(vocab - 259)]
    return tokens[:vocab], scores[:vocab]


def _quantize_synth(typ: GGMLType, seed: int, shape, sigma: float) -> bytes:
    n = int(np.prod(shape))
    out = native.synth_quantize(typ, seed, n, sigma)
    if out is None:
        # fallback: numpy synth + native/python quantize (tiny models only)
        rng = np.random.default_rng(seed)
        x = (rng.standard_normal(n) * sigma).astype(np.float32)
        out = native.quantize(typ, x)
        if out is None:
            from ..quant.codecs import quantize

            out = quantize(typ, x)
    return out


class _StreamingGGUFWriter(GGUFWriter):
    """GGUFWriter that writes tensor data straight to disk instead of
    accumulating multi-GB payloads in RAM. Tensors are registered with a
    byte-producing thunk; write() streams them in order."""

    def __init__(self, alignment: int = 32):
        super().__init__(alignment)
        self._lazy: list[tuple[str, tuple[int, ...], GGMLType, int, object]] = []

    def add_lazy_tensor(self, name, typ: GGMLType, shape, nbytes: int, thunk):
        blk = GGML_BLOCK_SIZES[typ][0]
        if len(shape) > 1 and shape[-1] % blk != 0:
            raise ValueError(
                f"tensor {name}: row length {shape[-1]} not a multiple of "
                f"{typ.name} block size {blk}"
            )
        ggml_dims = tuple(reversed(tuple(int(d) for d in shape)))
        self._lazy.append((name, ggml_dims, typ, nbytes, thunk))

    def write(self, path: str):
        align = self.alignment
        header = bytearray()
        header += struct.pack(
            "<IIQQ", GGUF_MAGIC, 3, len(self._lazy), len(self._metadata)
        )
        for key, value, typ in self._metadata:
            typ = typ if typ is not None else _value_type_of(value)
            header += _pack_str(key)
            header += struct.pack("<I", int(typ))
            header += _pack_value(value, typ)
        offset = 0
        for name, ggml_dims, typ, nbytes, _ in self._lazy:
            header += _pack_str(name)
            header += struct.pack("<I", len(ggml_dims))
            for d in ggml_dims:
                header += struct.pack("<Q", d)
            header += struct.pack("<I", int(typ))
            header += struct.pack("<Q", offset)
            offset += (nbytes + align - 1) // align * align
        data_start = (len(header) + align - 1) // align * align
        with open(path, "wb") as f:
            f.write(header)
            f.write(b"\x00" * (data_start - len(header)))
            for name, ggml_dims, typ, nbytes, thunk in self._lazy:
                data = thunk()
                assert len(data) == nbytes, name
                f.write(data)
                pad = (nbytes + align - 1) // align * align - nbytes
                if pad:
                    f.write(b"\x00" * pad)


def build_synth_gguf(
    path: str,
    model: str = "7b",
    typ: GGMLType = GGMLType.Q4_K,
    seed: int = 0,
    verbose: bool = False,
) -> str:
    dim, hidden, layers, heads, kv_heads, vocab, ctx = MODEL_SHAPES[model]
    w = _StreamingGGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.name", f"synthetic-{model}-{typ.name.lower()}")
    w.add_metadata("llama.context_length", ctx)
    w.add_metadata("llama.embedding_length", dim)
    w.add_metadata("llama.feed_forward_length", hidden)
    w.add_metadata("llama.block_count", layers)
    w.add_metadata("llama.attention.head_count", heads)
    w.add_metadata("llama.attention.head_count_kv", kv_heads)
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("llama.rope.dimension_count", dim // heads)
    experts = MODEL_EXPERTS.get(model)
    if experts:
        w.add_metadata("llama.expert_count", experts[0])
        w.add_metadata("llama.expert_used_count", experts[1])
    tokens, scores = _synth_tokenizer(vocab)
    w.add_metadata("tokenizer.ggml.model", "llama")
    w.add_metadata("tokenizer.ggml.tokens", tokens)
    w.add_metadata("tokenizer.ggml.scores", scores)
    w.add_metadata("tokenizer.ggml.bos_token_id", 1)
    w.add_metadata("tokenizer.ggml.eos_token_id", 2)

    kv_dim = kv_heads * (dim // heads)
    counter = [0]

    def add(name, shape, sigma=None, norm=False):
        if norm:
            ones = np.ones(shape, np.float32)
            w.add_lazy_tensor(name, GGMLType.F32, shape, ones.nbytes, ones.tobytes)
            return
        s = float(sigma if sigma is not None else 1.0 / np.sqrt(shape[-1]))
        counter[0] += 1
        tseed = seed * 1_000_003 + counter[0]
        n = int(np.prod(shape))
        belems, bbytes = GGML_BLOCK_SIZES[typ]
        w.add_lazy_tensor(
            name, typ, shape, (n // belems) * bbytes,
            lambda tseed=tseed, shape=shape, s=s: _quantize_synth(typ, tseed, shape, s),
        )

    add("token_embd.weight", (vocab, dim), sigma=0.02)
    for l in range(layers):
        add(f"blk.{l}.attn_q.weight", (dim, dim))
        add(f"blk.{l}.attn_k.weight", (kv_dim, dim))
        add(f"blk.{l}.attn_v.weight", (kv_dim, dim))
        add(f"blk.{l}.attn_output.weight", (dim, dim))
        if experts:
            E = experts[0]
            gi = (np.random.default_rng(seed * 7 + l).standard_normal(
                (E, dim)) * 0.02).astype(np.float32)
            w.add_lazy_tensor(f"blk.{l}.ffn_gate_inp.weight", GGMLType.F32,
                              (E, dim), gi.nbytes, gi.tobytes)
            add(f"blk.{l}.ffn_gate_exps.weight", (E, hidden, dim))
            add(f"blk.{l}.ffn_up_exps.weight", (E, hidden, dim))
            add(f"blk.{l}.ffn_down_exps.weight", (E, dim, hidden))
        else:
            add(f"blk.{l}.ffn_gate.weight", (hidden, dim))
            add(f"blk.{l}.ffn_up.weight", (hidden, dim))
            add(f"blk.{l}.ffn_down.weight", (dim, hidden))
        add(f"blk.{l}.attn_norm.weight", (dim,), norm=True)
        add(f"blk.{l}.ffn_norm.weight", (dim,), norm=True)
    add("output_norm.weight", (dim,), norm=True)
    add("output.weight", (vocab, dim), sigma=0.02)

    t0 = time.perf_counter()
    w.write(path)
    if verbose:
        import os

        gb = os.path.getsize(path) / 1e9
        print(f"wrote {path}: {gb:.2f} GB in {time.perf_counter() - t0:.1f}s")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--model", default="7b", choices=list(MODEL_SHAPES))
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    build_synth_gguf(
        args.out, args.model, GGMLType[args.quant.upper()], args.seed, verbose=True
    )


if __name__ == "__main__":
    main()
