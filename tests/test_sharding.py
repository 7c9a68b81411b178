"""Tensor-parallel correctness on a virtual 8-device CPU mesh: sharded
forward must match the single-device forward exactly (same f32 math, XLA
inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crabml_tpu.gguf.reader import GGUFFile
from crabml_tpu.models.config import config_from_gguf
from crabml_tpu.models.forward import KVCache, forward
from crabml_tpu.models.weights import load_weights
from crabml_tpu.parallel import cache_sharding, make_mesh, shard_weights

TOKENS = [1, 365, 400, 430, 284]


@pytest.fixture(scope="module")
def model260(stories260k_path):
    gf = GGUFFile(stories260k_path)
    cfg = config_from_gguf(gf.metadata)
    weights = load_weights(gf, cfg)
    return cfg, weights


@pytest.mark.parametrize("tp,dp", [(4, 1), (2, 2), (4, 2)])
def test_tp_forward_matches_single_device(model260, tp, dp):
    cfg, weights = model260
    if len(jax.devices()) < tp * dp:
        pytest.skip("not enough devices")
    # 260k: n_heads=8, n_kv_heads=4, hidden=172 (not % tp) → pad-free check
    if cfg.hidden_dim % tp or cfg.vocab_size % tp or cfg.n_kv_heads % tp:
        pytest.skip("dims not divisible")

    toks = jnp.asarray([TOKENS], jnp.int32)
    cache = KVCache.create(cfg, 1, 32)
    want, _ = forward(weights, cache, toks, jnp.zeros(1, jnp.int32), cfg)

    mesh = make_mesh(tp=tp, dp=dp)
    sharded = shard_weights(weights, mesh, cfg)
    cache_s = jax.device_put(KVCache.create(cfg, dp, 32), cache_sharding(mesh))
    toks_b = jnp.tile(toks, (dp, 1))
    got, new_cache = jax.jit(forward, static_argnames=("cfg",))(
        sharded, cache_s, toks_b, jnp.zeros(dp, jnp.int32), cfg
    )
    for b in range(dp):
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want[0]), rtol=2e-5, atol=2e-5
        )


def test_tp_validation_rejects_bad_split(model260):
    cfg, weights = model260
    mesh = make_mesh(tp=8, dp=1)
    with pytest.raises(AssertionError):
        shard_weights(weights, mesh, cfg)  # n_kv_heads=4 < 8


def test_global_mesh_and_distributed_single_process():
    """distributed helpers degrade to single-host behavior on the CPU mesh."""
    import jax

    from crabml_tpu.parallel import global_mesh, init_distributed

    assert init_distributed() == 1
    mesh = global_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}
    assert mesh.axis_names == ("dp", "tp")


def test_shard_weights_local_matches_shard_weights():
    import jax
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.synthetic import make_weights, tiny_config
    from crabml_tpu.parallel import make_mesh, shard_weights
    from crabml_tpu.parallel.distributed import shard_weights_local

    cfg = tiny_config()
    w = make_weights(cfg, GGMLType.Q8_0, seed=0)
    mesh = make_mesh(tp=4, dp=2)
    a = shard_weights(w, mesh, cfg)
    b = shard_weights_local(w, mesh, cfg)
    np.testing.assert_array_equal(
        np.asarray(a["layers"]["wq"].planes["qs"]),
        np.asarray(b["layers"]["wq"].planes["qs"]),
    )


def test_ring_attention_matches_dense():
    """Sequence-sharded ring attention == dense causal attention (8 devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.models.forward import attention
    from crabml_tpu.parallel import make_mesh
    from crabml_tpu.parallel.ring_attention import ring_prefill

    B, T, KV, G, hd = 1, 256, 2, 2, 64
    H = KV * G
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, T, hd)), jnp.float32)
    scale = 1.0 / np.sqrt(hd)

    import numpy as _np
    from jax.sharding import Mesh

    devs = _np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("sp",))

    got = ring_prefill(q, k, v, mesh, scale=float(scale))
    want = attention(q, k, v, jnp.zeros(B, jnp.int32), T, scale).reshape(B, T, H, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_shard_map_tp_matches_single_device():
    """Explicit shard_map TP forward == single-device forward (XLA path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import make_weights, tiny_config
    from crabml_tpu.parallel import make_mesh
    from crabml_tpu.parallel.tp import make_tp_forward

    cfg = tiny_config()
    w = make_weights(cfg, GGMLType.Q8_0, seed=4)
    tokens = np.array([[1, 3, 5, 7], [2, 4, 6, 8]], np.int32)
    pos = np.zeros(2, np.int32)

    # single device reference
    cache = KVCache.create(cfg, 2, 32)
    want, _ = forward(w, cache, jnp.asarray(tokens), jnp.asarray(pos), cfg)

    mesh = make_mesh(tp=4, dp=2)
    fn, sharded = make_tp_forward(w, mesh, cfg, jnp.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cache = jax.device_put(
        KVCache.create(cfg, 2, 32),
        NamedSharding(mesh, P(None, "dp", "tp", None, None)),
    )
    got, new_cache = fn(sharded, cache, jnp.asarray(tokens), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # decode step continues from the sharded cache
    got2, _ = fn(sharded, new_cache, jnp.asarray([[9], [10]], np.int32),
                 jnp.asarray([4, 4], np.int32))
    assert got2.shape == (2, 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(got2)).all()


def test_shard_map_tp_pallas_kernels():
    """Pallas kernel path under shard_map (interpret mode on the CPU mesh):
    shard-local fused dequant-matmul + explicit psums."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import make_weights, tiny_config
    from crabml_tpu.models.weights import repack_weights
    from crabml_tpu.ops import matmul as mm
    from crabml_tpu.parallel import make_mesh
    from crabml_tpu.parallel.tp import make_tp_forward
    from jax.sharding import NamedSharding, PartitionSpec as P

    # kernel-eligible dims: m % 256 == 0 after sharding, k steps % tp
    # col-sharded tensors need k-steps % tp: k=2048 -> two 1024 steps
    cfg = tiny_config(
        embedding_dim=2048, hidden_dim=2048, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=1024, seq_len=64,
    )
    w = make_weights(cfg, GGMLType.Q8_0, seed=6)
    tokens = np.array([[1, 3, 5, 7]], np.int32)
    pos = np.zeros(1, np.int32)

    cache = KVCache.create(cfg, 1, 32)
    want, _ = forward(w, cache, jnp.asarray(tokens), jnp.asarray(pos), cfg)

    wk = repack_weights(w)
    mesh = make_mesh(tp=2, dp=1)
    mm.set_backend("pallas")
    try:
        fn, sharded = make_tp_forward(wk, mesh, cfg, jnp.float32)
        cache = jax.device_put(
            KVCache.create(cfg, 1, 32),
            NamedSharding(mesh, P(None, "dp", "tp", None, None)),
        )
        got, _ = fn(sharded, cache, jnp.asarray(tokens), jnp.asarray(pos))
    finally:
        mm.set_backend("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_runner_tp_end_to_end(stories260k_path):
    """Runner on a tp=4/dp=1 mesh generates the same text as single-device."""
    from crabml_tpu.parallel import make_mesh
    from crabml_tpu.runtime.runner import Runner

    r1 = Runner(stories260k_path, seq_len=64)
    want = "".join(r1.prefill_and_generate("Lily is a cat", steps=12))

    mesh = make_mesh(tp=4, dp=1)
    r2 = Runner(stories260k_path, seq_len=64, sharding=mesh)
    got = "".join(r2.prefill_and_generate("Lily is a cat", steps=12))
    assert got == want


def test_overlapped_collective_matmul_matches():
    """Ring-pipelined psum matmul == compute-then-psum, logits-exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.forward import KVCache
    from crabml_tpu.models.synthetic import make_weights, tiny_config
    from crabml_tpu.parallel import make_mesh
    from crabml_tpu.parallel.tp import make_tp_forward

    cfg = tiny_config(
        embedding_dim=2048, hidden_dim=2048, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=1024, seq_len=64,
    )
    w = make_weights(cfg, GGMLType.Q8_0, seed=8)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    mesh = make_mesh(tp=2, dp=1)
    csh = NamedSharding(mesh, P(None, "dp", "tp", None, None))

    fn_a, sh_a = make_tp_forward(w, mesh, cfg, jnp.float32)
    got_a, _ = fn_a(sh_a, jax.device_put(KVCache.create(cfg, 1, 32), csh), tokens, pos)

    fn_b, sh_b = make_tp_forward(w, mesh, cfg, jnp.float32, overlap_collectives=True)
    got_b, _ = fn_b(sh_b, jax.device_put(KVCache.create(cfg, 1, 32), csh), tokens, pos)

    np.testing.assert_allclose(np.asarray(got_a), np.asarray(got_b), rtol=1e-5, atol=1e-5)


def test_lazy_sharded_load_matches_eager(tmp_path):
    """load_weights_sharded (per-shard mmap slicing) must equal the eager
    planar load + shard_weights, plane by plane."""
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.weights import load_weights
    from crabml_tpu.parallel.lazy_load import load_weights_sharded
    from crabml_tpu.tools.synth_gguf import build_synth_gguf

    path = str(tmp_path / "tiny-q4k.gguf")
    build_synth_gguf(path, "tiny", GGMLType.Q4_K)
    gf = GGUFFile(path)
    cfg = config_from_gguf(gf.metadata)

    mesh = make_mesh(tp=2, dp=1)
    lazy = load_weights_sharded(gf, cfg, mesh)
    eager = load_weights(gf, cfg, layout="planar")
    eager_sharded = shard_weights(eager, mesh, cfg)

    for name in ("wq", "wo", "ffn_down", "ffn_gate"):
        lz, eg = lazy["layers"][name], eager_sharded["layers"][name]
        assert lz.kind == eg.kind and tuple(lz.shape) == tuple(eg.shape)
        for pn in eg.planes:
            a = np.asarray(lz.planes[pn])
            b = np.asarray(eg.planes[pn])
            np.testing.assert_array_equal(a, b, err_msg=f"{name}:{pn}")
            assert lz.planes[pn].sharding == eg.planes[pn].sharding
    for pn in eager_sharded["output"].planes:
        np.testing.assert_array_equal(
            np.asarray(lazy["output"].planes[pn]),
            np.asarray(eager_sharded["output"].planes[pn]),
        )


def test_lazy_shard_memory_bounded(tmp_path):
    """VERDICT r1 #8 'Done' criterion: extracting one shard of a large
    tensor must not materialize the full tensor on the host. Measured in a
    subprocess (ru_maxrss is process-lifetime peak)."""
    import pathlib
    import subprocess
    import sys

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    code = f"""
import numpy as np, resource, sys
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from crabml_tpu.gguf.writer import GGUFWriter
from crabml_tpu.gguf.constants import GGMLType
from crabml_tpu import native

# one 512 MB Q8_0 tensor (m=16384, k=16384 -> 16384*16384*34/32 bytes)
m = k = 16384
w = GGUFWriter()
w.add_metadata("general.architecture", "llama")
raw = native.synth_quantize(GGMLType.Q8_0, 1, m * k, 0.02)
w.add_tensor("big.weight", GGMLType.Q8_0, (m, k), raw)
p = {str(tmp_path / 'big.gguf')!r}
w.write(p)
del raw, w
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KB on linux

from crabml_tpu.gguf.reader import GGUFFile
from crabml_tpu.parallel.lazy_load import LazyQTensor
gf = GGUFFile(p)
lt = LazyQTensor(gf, "big.weight")
shard = lt.shard(slice(0, m // 8), slice(0, k))  # 1/8 of the rows
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
shard_mb = sum(v.nbytes for v in shard.planes.values()) / 1e6
extra_mb = (peak - base) * 1024 / 1e6
print(f"shard={{shard_mb:.0f}}MB extra_rss={{extra_mb:.0f}}MB")
assert extra_mb < 3 * shard_mb + 50, f"full-tensor materialization: {{extra_mb}}MB"
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_sequence_parallel_runner_matches_dense(stories260k_path):
    """SURVEY §5.7 north star through the PUBLIC API: a prompt longer than
    one shard's cache range runs sequence-parallel (ring-attention prefill
    + psum-combined decode over the S-sharded cache) and produces the same
    greedy text as the dense single-device Runner."""
    from crabml_tpu.parallel.sp import SequenceParallelRunner
    from crabml_tpu.runtime.runner import Runner

    prompt = "Lily is a cat who likes to play with yarn and chase mice " * 2
    dense = Runner(stories260k_path, seq_len=128)
    want = "".join(dense.prefill_and_generate(prompt, steps=12))

    sp = SequenceParallelRunner(stories260k_path, sp=4, seq_len=128)
    n_prompt = len(sp.tokenizer.encode(prompt, bos=True))
    assert n_prompt > 128 // 4, "prompt must exceed one shard's cache range"
    got = "".join(sp.prefill_and_generate(prompt, steps=12))
    assert got == want, f"{got!r} != {want!r}"


def test_sp_chunked_prefill_multi_chunk(stories260k_path):
    """VERDICT r2 #7: chunked sp prefill — a prompt spanning several
    chunks (forced tiny chunk width) generates identically to the dense
    Runner, and each chunk pays only its own width."""
    from crabml_tpu.parallel.sp import SequenceParallelRunner
    from crabml_tpu.runtime.runner import Runner

    prompt = ("Once upon a time there was a little cat named Lily and she "
              "liked to play with her friends in the big green garden")
    r = Runner(stories260k_path, seq_len=256)
    want = "".join(r.prefill_and_generate(prompt, steps=10))

    sp = SequenceParallelRunner(stories260k_path, sp=4, seq_len=256)
    sp.MAX_CHUNK_PER_DEV = 4  # prompt (~30 tokens) -> 2+ chunks of C=16
    n_prompt = len(sp.tokenizer.encode(prompt, bos=True))
    assert n_prompt > 16  # genuinely multi-chunk
    got = "".join(sp.prefill_and_generate(prompt, steps=10))
    assert got == want


def test_sp_sampler_parity(stories260k_path):
    """Sampler plumbs through the sp runner (same seed+params => same
    tokens as greedy at temperature 0; sampled path runs end to end)."""
    from crabml_tpu.parallel.sp import SequenceParallelRunner
    from crabml_tpu.runtime.sampler import Sampler

    greedy = SequenceParallelRunner(stories260k_path, sp=2, seq_len=128)
    want = "".join(greedy.prefill_and_generate("Lily is a cat", steps=8))

    s0 = SequenceParallelRunner(stories260k_path, sp=2, seq_len=128,
                                sampler=Sampler(temperature=0.0))
    assert "".join(s0.prefill_and_generate("Lily is a cat", steps=8)) == want

    st = SequenceParallelRunner(stories260k_path, sp=2, seq_len=128,
                                sampler=Sampler(temperature=0.8, topp=0.9),
                                seed=7)
    out = "".join(st.prefill_and_generate("Lily is a cat", steps=8))
    assert len(out) > 0


def test_sp_x_tp_mesh_generation(stories260k_path):
    """sp=2 x tp=2 composed mesh: tp-sharded weights (Megatron recipe) +
    sp-sharded cache, generating through the public API identically to
    the dense Runner (VERDICT r2 #7)."""
    from crabml_tpu.parallel.sp import SequenceParallelRunner
    from crabml_tpu.runtime.runner import Runner

    prompt = "Once upon a time there was a little cat"
    r = Runner(stories260k_path, seq_len=128)
    want = "".join(r.prefill_and_generate(prompt, steps=10))

    sp = SequenceParallelRunner(stories260k_path, sp=2, tp=2, seq_len=128)
    assert sp.mesh.shape == {"sp": 2, "tp": 2}
    got = "".join(sp.prefill_and_generate(prompt, steps=10))
    assert got == want


def test_expert_parallel_ffn_matches_dense(tmp_path):
    """"ep" mesh axis (VERDICT r2 #3): expert planes sharded over 4
    devices; the ep FFN must equal the single-device dense MoE FFN."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig
    from crabml_tpu.models.forward import moe_ffn
    from crabml_tpu.models.synthetic import make_weights
    from crabml_tpu.parallel.ep import (EXPERT_TENSORS, ep_weight_specs,
                                        expert_parallel_ffn, localize_experts)

    cfg = ModelConfig(
        architecture="llama", model_name="ep-test",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=128, seq_len=32, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"], n_experts=4, n_experts_used=2,
    )
    w = make_weights(cfg, GGMLType.F32, seed=61)
    lw = dict(w["layers"])
    rng = np.random.default_rng(3)
    # expert tensors (make_weights builds the dense-FFN schema only)
    from crabml_tpu.quant.codecs import quantize
    from crabml_tpu.quant.planar import stack_qtensors, to_planar

    E, HD, D, L = cfg.n_experts, cfg.hidden_dim, cfg.embedding_dim, cfg.n_layers

    def stack_exp(m, k):
        outs = []
        for _ in range(L):
            a = (rng.standard_normal((m, k)) * 0.05).astype(np.float32)
            outs.append(to_planar(GGMLType.F32, quantize(GGMLType.F32, a), (m, k)))
        return stack_qtensors(outs)

    lw["ffn_gate_inp"] = (rng.standard_normal((L, E, D)) * 0.1).astype(np.float32)
    lw["ffn_gate_exps"] = stack_exp(E * HD, D)
    lw["ffn_up_exps"] = stack_exp(E * HD, D)
    lw["ffn_down_exps"] = stack_exp(E * D, HD)
    x = jnp.asarray(rng.standard_normal((2, 3, 64)), jnp.float32)

    want = np.asarray(moe_ffn(lw, 1, x, cfg, jnp.float32))

    ep = 4
    mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
    moe_names = [n for n in EXPERT_TENSORS if n in lw]
    sharded = {}
    specs = {}
    for name in list(lw):
        val = lw[name]
        if name in moe_names:
            sp_ = ep_weight_specs(val)
            sharded[name] = jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                val, sp_)
            specs[name] = sp_
        else:
            sharded[name] = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P())), val)
            specs[name] = jax.tree.map(lambda _: P(), val)

    local = {n: (localize_experts(v, ep) if n in moe_names else v)
             for n, v in sharded.items()}

    def body(lw_in, x_in):
        lw_loc = {
            n: (QT(v.kind, local[n].shape, v.planes)
                if n in moe_names else v)
            for n, v in lw_in.items()
        }
        return expert_parallel_ffn(lw_loc, 1, x_in, cfg, jnp.float32)

    from crabml_tpu.quant.planar import QTensor as QT

    fn = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_rep=False,
    ))
    got = np.asarray(fn(sharded, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sp_gemma2_matches_dense(tmp_path):
    """gemma2's block shape (post-norms, attn+final softcaps, alternating
    sliding window) through SequenceParallelRunner: same greedy text as
    the dense Runner. The window mask rides GLOBAL row/col ids, so it
    composes with chunked prefill offsets and the sharded decode combine
    (removes the r2 UnsupportedError guard)."""
    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.parallel.sp import SequenceParallelRunner
    from crabml_tpu.runtime.runner import Runner

    cfg = ModelConfig(
        architecture="gemma2", model_name="syn-g2-sp",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=128, rms_norm_eps=1e-5,
        **{**ARCH_FEATURES["gemma2"], "attn_logit_softcap": 5.0,
           "final_logit_softcap": 10.0, "sliding_window": 8},
    )
    path = str(tmp_path / "g2sp.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=41)

    prompt = "Lily is a cat who likes to play with yarn " * 2
    dense = Runner(path, seq_len=128)
    want = "".join(dense.prefill_and_generate(prompt, steps=12))

    sp = SequenceParallelRunner(path, sp=4, seq_len=128)
    n_prompt = len(sp.tokenizer.encode(prompt, bos=True))
    assert n_prompt > 128 // 4, "prompt must exceed one shard's cache range"
    assert n_prompt > 8, "prompt must exceed the sliding window"
    got = "".join(sp.prefill_and_generate(prompt, steps=12))
    assert got == want, f"{got!r} != {want!r}"
