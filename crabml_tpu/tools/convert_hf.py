"""HuggingFace checkpoint (safetensors) -> GGUF converter.

The reference consumes GGUF files produced by llama.cpp's converter
ecosystem; a user switching to this framework needs the same on-ramp
without leaving it. This is a from-scratch equivalent of the relevant
slice of llama.cpp's convert_hf_to_gguf.py: read config.json +
*.safetensors (+ sharded index) + tokenizer.json, map tensor names to
the GGUF schema this loader reads (models/weights.py), apply the
rope-layout permutation for interleaved-rope architectures, and write a
GGUF v3 via gguf.writer (quantized on the fly to --outtype).

Supported model_types: phi (-> phi2), phi3, llama, mistral, mixtral (-> llama; experts
stacked into the 3D ffn_*_exps tensors + expert_count metadata), qwen2,
qwen3, gemma, gemma2. Shared-expert MoE (qwen-moe) is rejected.

Format notes (all byte-level, no deps):
- safetensors: 8-byte LE header length, JSON header {name: {dtype,
  shape, data_offsets}}, raw little-endian data. BF16 widens via a
  uint16 -> uint32<<16 reinterpret.
- HF llama q/k projections are stored for rotate-half ("neox") rope;
  GGUF's llama arch ropes interleaved pairs, so rows permute per head:
  (head, 2, hd/2, :) -> (head, hd/2, 2, :) — the same permutation
  llama.cpp applies on convert. neox-rope archs (qwen*, gemma*) pass
  through unchanged.
- gemma/gemma2 HF RMSNorm computes x * (1 + w); ggml stores the
  already-offset weight, so +1 is added to every norm tensor.
- HF "llama3" rope scaling becomes a rope_freqs.weight tensor of
  per-frequency divisors (the GGUF convention our loader reads).

Usage: python -m crabml_tpu.tools.convert_hf <hf_dir> <out.gguf>
       [--outtype f32|f16|q8_0|q4_0|q4_k|q5_k|q6_k|...]
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys

import numpy as np

from ..errors import FormatError, UnsupportedError
from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from ..quant.codecs import quantize

_ST_DTYPES = {
    "F32": (np.float32, 4),
    "F16": (np.float16, 2),
    "BF16": (np.uint16, 2),
    "F64": (np.float64, 8),
}


class LazyHFTensors:
    """safetensors tensors materialized one at a time on `pop`.

    Eagerly decoding a whole checkpoint to float32 costs 2x an f16
    checkpoint's size in RAM (~28 GB for a 7B, ~190 GB for 8x7B); this
    keeps only uint8 memmaps open and decodes a tensor when the writer
    is ready for it, bounding peak memory at one tensor."""

    def __init__(self):
        self._entries: dict[str, tuple] = {}

    def add_file(self, path: str):
        with open(path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        mm = np.memmap(path, np.uint8, mode="r")
        data_start = 8 + hlen
        for name, info in header.items():
            if name == "__metadata__":
                continue
            dt = info["dtype"]
            if dt not in _ST_DTYPES:
                raise UnsupportedError(f"safetensors dtype {dt} ({name})")
            b0, b1 = info["data_offsets"]
            self._entries[name] = (
                mm, dt, info["shape"], data_start + b0, data_start + b1)

    def __contains__(self, name) -> bool:
        return name in self._entries

    def __iter__(self):
        return iter(self._entries)

    def pop(self, name: str, *default) -> np.ndarray:
        if name not in self._entries:
            if default:
                return default[0]
            raise KeyError(name)
        mm, dt, shape, s, e = self._entries.pop(name)
        npdt, _ = _ST_DTYPES[dt]
        raw = np.frombuffer(mm[s:e].tobytes(), npdt)
        if dt == "BF16":
            arr = (raw.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = raw.astype(np.float32)
        return arr.reshape(shape)


def load_hf_tensors(hf_dir: str) -> LazyHFTensors:
    """All tensors from a HF dir: single file or sharded via index.json."""
    out = LazyHFTensors()
    idx = os.path.join(hf_dir, "model.safetensors.index.json")
    if os.path.exists(idx):
        with open(idx) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        for fn in files:
            out.add_file(os.path.join(hf_dir, fn))
        return out
    single = os.path.join(hf_dir, "model.safetensors")
    if not os.path.exists(single):
        raise FormatError(f"no model.safetensors[.index.json] in {hf_dir}")
    out.add_file(single)
    return out


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """Rotate-half (HF) -> interleaved-pair (ggml llama rope) row order."""
    hd = w.shape[0] // n_head
    return (
        w.reshape((n_head, 2, hd // 2) + w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def llama3_rope_freqs(rs: dict, head_dim: int, rope_base: float) -> np.ndarray:
    """Per-frequency divisors for HF rope_scaling type 'llama3' — the
    piecewise smooth interpolation llama.cpp bakes into rope_freqs.weight."""
    factor = rs.get("factor", 8.0)
    low = rs.get("low_freq_factor", 1.0)
    high = rs.get("high_freq_factor", 4.0)
    orig = rs.get("original_max_position_embeddings", 8192)
    freqs = rope_base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    wavelen = 2 * np.pi * freqs  # wavelength of each inv_freq component
    out = np.ones_like(wavelen)
    out[wavelen > orig / low] = factor  # low-frequency: full scaling
    mid = (wavelen <= orig / low) & (wavelen >= orig / high)
    smooth = (orig / wavelen[mid] - low) / (high - low)
    out[mid] = 1.0 / ((1 - smooth) / factor + smooth)
    return out.astype(np.float32)


_ARCH_MAP = {
    "llama": "llama",
    "mistral": "llama",
    "mixtral": "llama",  # llama arch + expert metadata (config.py:190-194)
    "qwen2": "qwen2",
    "qwen3": "qwen3",
    "gemma": "gemma",
    "gemma2": "gemma2",
    "phi": "phi2",   # microsoft/phi-2 checkpoints (model_type "phi")
    "phi3": "phi3",
}

# per-layer HF suffix -> GGUF suffix (weight implied); None = skip
_LAYER_MAP = {
    "self_attn.q_proj": "attn_q",
    "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v",
    "self_attn.o_proj": "attn_output",
    "mlp.gate_proj": "ffn_gate",
    "mlp.up_proj": "ffn_up",
    "mlp.down_proj": "ffn_down",
    "input_layernorm": "attn_norm",
    "self_attn.q_norm": "attn_q_norm",
    "self_attn.k_norm": "attn_k_norm",
}


def convert_hf(hf_dir: str, out_path: str, outtype: str = "f16",
               verbose: bool = True) -> dict:
    with open(os.path.join(hf_dir, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type")
    if mt not in _ARCH_MAP:
        raise UnsupportedError(
            f"model_type {mt!r} (supported: {sorted(_ARCH_MAP)})")
    n_experts = int(hf.get("num_local_experts") or 0)
    if hf.get("num_experts") and not n_experts:
        # qwen-moe style checkpoints carry shared experts our forward
        # doesn't model — reject rather than convert something wrong
        raise UnsupportedError(
            "shared-expert MoE (qwen-moe) is not supported; "
            "mixtral-style (num_local_experts) is")
    arch = _ARCH_MAP[mt]
    gemma = arch in ("gemma", "gemma2")

    D = hf["hidden_size"]
    n_head = hf["num_attention_heads"]
    n_kv = hf.get("num_key_value_heads", n_head)
    head_dim = hf.get("head_dim") or D // n_head
    L = hf["num_hidden_layers"]
    typ = GGMLType[outtype.upper()]

    w = GGUFWriter()
    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", hf.get("_name_or_path", "") or
                   os.path.basename(os.path.abspath(hf_dir)))
    w.add_metadata(f"{arch}.embedding_length", D)
    w.add_metadata(f"{arch}.feed_forward_length", hf["intermediate_size"])
    w.add_metadata(f"{arch}.block_count", L)
    w.add_metadata(f"{arch}.attention.head_count", n_head)
    w.add_metadata(f"{arch}.attention.head_count_kv", n_kv)
    w.add_metadata(f"{arch}.context_length", hf.get("max_position_embeddings", 4096))
    if arch == "phi2":  # phi2 is LayerNorm, different eps key (config.py)
        w.add_metadata(f"{arch}.attention.layer_norm_epsilon",
                       float(hf.get("layer_norm_eps", 1e-5)))
    else:
        w.add_metadata(f"{arch}.attention.layer_norm_rms_epsilon",
                       float(hf.get("rms_norm_eps", 1e-5)))
    w.add_metadata(f"{arch}.rope.freq_base", float(hf.get("rope_theta", 10000.0)))
    # partial rotary (phi2: 0.4 * head_dim) — rope covers only these dims
    rope_dim = int(round(float(hf.get("partial_rotary_factor") or 1.0) * head_dim))
    w.add_metadata(f"{arch}.rope.dimension_count", rope_dim)
    if head_dim != D // n_head:
        w.add_metadata(f"{arch}.attention.key_length", head_dim)
        w.add_metadata(f"{arch}.attention.value_length", head_dim)
    if n_experts:
        w.add_metadata(f"{arch}.expert_count", n_experts)
        w.add_metadata(f"{arch}.expert_used_count",
                       int(hf.get("num_experts_per_tok", 2)))
    if arch == "gemma2":
        if hf.get("attn_logit_softcapping"):
            w.add_metadata(f"{arch}.attn_logit_softcapping",
                           float(hf["attn_logit_softcapping"]))
        if hf.get("final_logit_softcapping"):
            w.add_metadata(f"{arch}.final_logit_softcapping",
                           float(hf["final_logit_softcapping"]))
        if hf.get("sliding_window"):
            w.add_metadata(f"{arch}.attention.sliding_window",
                           int(hf["sliding_window"]))

    rope_freqs = None
    rs = hf.get("rope_scaling") or {}
    rs_type = rs.get("rope_type") or rs.get("type")
    if rs_type == "linear":
        w.add_metadata(f"{arch}.rope.scaling.type", "linear")
        w.add_metadata(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    elif rs_type == "yarn":
        w.add_metadata(f"{arch}.rope.scaling.type", "yarn")
        w.add_metadata(f"{arch}.rope.scaling.factor", float(rs["factor"]))
        w.add_metadata(f"{arch}.rope.scaling.original_context_length",
                       int(rs.get("original_max_position_embeddings", 0)))
        if rs.get("attention_factor") is not None:
            w.add_metadata(f"{arch}.rope.scaling.attn_factor",
                           float(rs["attention_factor"]))
    elif rs_type == "llama3":
        rope_freqs = llama3_rope_freqs(rs, head_dim,
                                       float(hf.get("rope_theta", 10000.0)))
    elif rs_type not in (None, "default"):
        raise UnsupportedError(f"rope_scaling type {rs_type!r}")

    _add_tokenizer_metadata(w, hf_dir, hf)

    tensors = load_hf_tensors(hf_dir)
    interleave = arch == "llama"  # ggml llama rope = interleaved pairs

    def emit(name: str, x: np.ndarray, force_f32: bool = False):
        t = GGMLType.F32 if (force_f32 or x.ndim == 1) else typ
        if t not in (GGMLType.F32, GGMLType.F16) and x.shape[-1] % 256:
            t = GGMLType.F16  # K-quant superblocks need k % 256
        w.add_tensor(name, t, x.shape, quantize(t, np.ascontiguousarray(x)))
        if verbose:
            print(f"  {name} {tuple(x.shape)} -> {t.name}", file=sys.stderr)

    def norm(x):
        return x + 1.0 if gemma else x  # HF gemma: x * (1 + w)

    emit("token_embd.weight", tensors.pop("model.embed_tokens.weight"))
    if arch == "phi2":  # LayerNorm tail: weight + bias, different HF name
        emit("output_norm.weight", tensors.pop("model.final_layernorm.weight"),
             force_f32=True)
        emit("output_norm.bias", tensors.pop("model.final_layernorm.bias"),
             force_f32=True)
    else:
        emit("output_norm.weight", norm(tensors.pop("model.norm.weight")),
             force_f32=True)
    if "lm_head.weight" in tensors and not hf.get("tie_word_embeddings"):
        emit("output.weight", tensors.pop("lm_head.weight"))
        if "lm_head.bias" in tensors:  # phi2 (llama.cpp build_phi2 adds it)
            emit("output.bias", tensors.pop("lm_head.bias"), force_f32=True)
    else:
        tensors.pop("lm_head.weight", None)  # tied: loader falls back
    if rope_freqs is not None:
        emit("rope_freqs.weight", rope_freqs, force_f32=True)

    for l in range(L):
        pre = f"model.layers.{l}."
        if arch == "phi2":
            # fused qkv rows [q|k|v] + biases; dense -> attn_output;
            # fc1/fc2 -> ffn_up/ffn_down (gateless GeLU); neox rope so no
            # permutation (weights.py phi2 schema splits the fusion back)
            for kind in ("weight", "bias"):
                qkv = np.concatenate([
                    tensors.pop(f"{pre}self_attn.{p}.{kind}")
                    for p in ("q_proj", "k_proj", "v_proj")
                ])
                emit(f"blk.{l}.attn_qkv.{kind}", qkv, force_f32=kind == "bias")
                for hf_n, gg in (("self_attn.dense", "attn_output"),
                                 ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"),
                                 ("input_layernorm", "attn_norm")):
                    emit(f"blk.{l}.{gg}.{kind}",
                         tensors.pop(f"{pre}{hf_n}.{kind}"),
                         force_f32=kind == "bias" or "norm" in gg)
            continue
        if arch == "phi3":
            # HF phi3 ships qkv_proj and gate_up_proj ALREADY fused in the
            # [q|k|v] / [gate|up] row order weights.py's phi3 schema slices
            for hf_n, gg in (("self_attn.qkv_proj", "attn_qkv"),
                             ("self_attn.o_proj", "attn_output"),
                             ("mlp.gate_up_proj", "ffn_up"),
                             ("mlp.down_proj", "ffn_down"),
                             ("input_layernorm", "attn_norm"),
                             ("post_attention_layernorm", "ffn_norm")):
                emit(f"blk.{l}.{gg}.weight", tensors.pop(f"{pre}{hf_n}.weight"),
                     force_f32="norm" in gg)
            continue
        if n_experts:
            # mixtral: router (E, D) f32 + per-expert w1/w3/w2 stacked into
            # the 3D ffn_*_exps tensors the loader reads (weights.py:199-212)
            emit(f"blk.{l}.ffn_gate_inp.weight",
                 tensors.pop(f"{pre}block_sparse_moe.gate.weight"),
                 force_f32=True)
            for hf_w, gg_exp in (("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                                 ("w2", "ffn_down_exps")):
                stacked = np.stack([
                    tensors.pop(f"{pre}block_sparse_moe.experts.{e}.{hf_w}.weight")
                    for e in range(n_experts)
                ])
                emit(f"blk.{l}.{gg_exp}.weight", stacked)
        for hf_suffix, gg in _layer_items(arch):
            for kind in ("weight", "bias"):
                key = f"{pre}{hf_suffix}.{kind}"
                if key not in tensors:
                    continue
                x = tensors.pop(key)
                if hf_suffix == "self_attn.q_proj" and interleave:
                    x = permute_rope(x, n_head)
                elif hf_suffix == "self_attn.k_proj" and interleave:
                    x = permute_rope(x, n_kv)
                if "norm" in hf_suffix:
                    x = norm(x)
                emit(f"blk.{l}.{gg}.{kind}", x, force_f32=kind == "bias")

    leftovers = [t for t in tensors if "rotary_emb" not in t]
    if leftovers:
        raise UnsupportedError(f"unmapped tensors: {sorted(leftovers)[:8]}")

    w.write(out_path)
    return {"arch": arch, "layers": L, "outtype": typ.name,
            "bytes": os.path.getsize(out_path)}


def _layer_items(arch: str):
    items = dict(_LAYER_MAP)
    if arch == "gemma2":
        items["post_attention_layernorm"] = "post_attention_norm"
        items["pre_feedforward_layernorm"] = "ffn_norm"
        items["post_feedforward_layernorm"] = "post_ffw_norm"
    else:
        items["post_attention_layernorm"] = "ffn_norm"
    return items.items()


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _proto_fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over a protobuf message.
    Length-delimited values yield bytes; varints ints; fixed32/64 raw."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise FormatError(f"unsupported protobuf wire type {wt}")
        yield fn, wt, v


def parse_spm_model(path: str):
    """Minimal sentencepiece ModelProto parse: pieces' text, score, type.

    The proto schema slice used (sentencepiece_model.proto): ModelProto
    field 1 = repeated SentencePiece {1: piece (string), 2: score (float),
    3: type (enum, same numbering GGUF token_type uses: NORMAL=1 ...
    BYTE=6)}. No sentencepiece dependency — 30 lines of wire format.
    """
    with open(path, "rb") as f:
        buf = f.read()
    tokens, scores, types = [], [], []
    for fn, wt, v in _proto_fields(buf):
        if fn != 1 or wt != 2:
            continue
        piece, score, typ = "", 0.0, 1
        for pfn, pwt, pv in _proto_fields(v):
            if pfn == 1 and pwt == 2:
                piece = pv.decode("utf-8")
            elif pfn == 2 and pwt == 5:
                score = struct.unpack("<f", pv)[0]
            elif pfn == 3 and pwt == 0:
                typ = pv
        tokens.append(piece)
        scores.append(score)
        types.append(typ)
    if not tokens:
        raise FormatError(f"{path}: no sentencepiece pieces found")
    return tokens, scores, types


def _chat_template(hf_dir: str) -> str | None:
    """HF chat template: tokenizer_config.json's chat_template field
    (string, or the multi-template list form) or chat_template.jinja."""
    tc_path = os.path.join(hf_dir, "tokenizer_config.json")
    if os.path.exists(tc_path):
        with open(tc_path) as f:
            ct = json.load(f).get("chat_template")
        if isinstance(ct, str):
            return ct
        if isinstance(ct, list):  # [{name, template}, ...]; "default" wins
            for entry in ct:
                if entry.get("name") == "default":
                    return entry.get("template")
            if ct and isinstance(ct[0], dict):
                return ct[0].get("template")
    jinja = os.path.join(hf_dir, "chat_template.jinja")
    if os.path.exists(jinja):
        with open(jinja) as f:
            return f.read()
    return None


def _add_tokenizer_metadata(w: GGUFWriter, hf_dir: str, hf: dict):
    """tokenizer.json (BPE) -> gpt2-style GGUF tokenizer metadata (the
    same parse the runtime facade uses for its HF passthrough), or
    tokenizer.model (sentencepiece) -> llama-style metadata."""
    from ..tokenizer.gpt2_bpe import TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL
    from ..tokenizer.facade import _hf_bos_eos

    ct = _chat_template(hf_dir)
    if ct:
        w.add_metadata("tokenizer.chat_template", ct)

    tj_path = os.path.join(hf_dir, "tokenizer.json")
    spm_path = os.path.join(hf_dir, "tokenizer.model")
    if not os.path.exists(tj_path) and os.path.exists(spm_path):
        tokens, scores, types = parse_spm_model(spm_path)
        # id 0 is a legitimate token id — test against None, not falsiness
        bos_raw = hf.get("bos_token_id")
        bos = int(bos_raw) if bos_raw is not None else 1
        eos_raw = hf.get("eos_token_id")
        if isinstance(eos_raw, list):
            eos_raw = eos_raw[0] if eos_raw else None
        eos = int(eos_raw) if eos_raw is not None else 2
        w.add_metadata("tokenizer.ggml.model", "llama")
        w.add_metadata("tokenizer.ggml.tokens", tokens)
        w.add_metadata("tokenizer.ggml.scores", np.asarray(scores, np.float32))
        w.add_metadata("tokenizer.ggml.token_type",
                       np.asarray(types, np.int32))
        w.add_metadata("tokenizer.ggml.bos_token_id", bos)
        w.add_metadata("tokenizer.ggml.eos_token_id", eos)
        return
    if not os.path.exists(tj_path):
        raise UnsupportedError(
            "no tokenizer.json or tokenizer.model in checkpoint")
    with open(tj_path) as f:
        tj = json.load(f)
    model = tj.get("model", {})
    if model.get("type") != "BPE":
        raise UnsupportedError(
            f"tokenizer.json model type {model.get('type')!r}: only BPE")
    vocab = model["vocab"]
    tokens: list[str | None] = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    added = tj.get("added_tokens", [])
    for a in added:
        i = a["id"]
        if i >= len(tokens):
            tokens.extend([None] * (i + 1 - len(tokens)))
        tokens[i] = a["content"]
    if any(t is None for t in tokens):
        raise FormatError("tokenizer.json has vocab id gaps")
    types = np.full(len(tokens), TOKEN_TYPE_NORMAL, np.int32)
    for a in added:
        if a.get("special", True):
            types[a["id"]] = TOKEN_TYPE_CONTROL
    merges = [m if isinstance(m, str) else " ".join(m)
              for m in model.get("merges", [])]
    ids = {t: i for i, t in enumerate(tokens)}
    bos, eos = _hf_bos_eos(tj, ids)
    if hf.get("bos_token_id") is not None:
        bos = int(hf["bos_token_id"])
    if hf.get("eos_token_id") is not None and not isinstance(hf["eos_token_id"], list):
        eos = int(hf["eos_token_id"])
    w.add_metadata("tokenizer.ggml.model", "gpt2")
    w.add_metadata("tokenizer.ggml.tokens", [str(t) for t in tokens])
    w.add_metadata("tokenizer.ggml.merges", merges)
    w.add_metadata("tokenizer.ggml.token_type", types)
    w.add_metadata("tokenizer.ggml.bos_token_id", bos)
    w.add_metadata("tokenizer.ggml.eos_token_id", eos)


def main(argv=None):
    ap = argparse.ArgumentParser("crabml-tpu-convert-hf", description=__doc__)
    ap.add_argument("hf_dir", help="HF checkpoint directory")
    ap.add_argument("out", help="output .gguf path")
    ap.add_argument("--outtype", default="f16",
                    help="weight dtype/quant scheme (f32, f16, q8_0, q4_0, "
                         "q4_k, q5_k, q6_k, ...)")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    info = convert_hf(args.hf_dir, args.out, args.outtype,
                      verbose=not args.quiet)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
