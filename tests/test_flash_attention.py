"""Flash prefill kernel vs the exact XLA attention path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crabml_tpu.models.forward import attention
from crabml_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("pos0", [0, 64], ids=["fresh", "resumed"])
@pytest.mark.parametrize("gqa", [1, 4], ids=["mha", "gqa4"])
def test_flash_matches_xla(pos0, gqa):
    B, T, S, KV, hd = 2, 128, 256, 2, 64
    H = KV * gqa
    rng = np.random.default_rng(pos0 + gqa)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    pos = jnp.asarray([pos0, pos0 // 2], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = attention.__wrapped__(q, k, v, pos, T, scale) if hasattr(attention, "__wrapped__") else None
    # call the XLA path directly (flash dispatch only fires on pallas backend)
    from crabml_tpu.models import forward as fwd
    want = fwd.attention(q, k, v, pos, T, scale)

    got = flash_attention(q, k, v, pos, scale, force=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_fallback_shapes():
    # T=1 (decode) and odd sizes return None
    q = jnp.zeros((1, 96, 4, 64))
    k = jnp.zeros((1, 4, 200, 64))
    v = jnp.zeros((1, 4, 200, 64))
    assert flash_attention(q, k, v, jnp.zeros(1, jnp.int32), 1.0) is None


def test_eligibility_matrix_and_fallback_log(caplog):
    """VERDICT r2 #6: pin which shapes take which path, and that silent
    fallbacks log once. flash takes hd=80 (verified numerically on-chip);
    the DMA decode kernel requires hd%128 and must LOG when it refuses."""
    import logging

    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.ops.pallas.decode_attention import decode_attention
    from crabml_tpu.ops.pallas.flash_attention import flash_attention
    from crabml_tpu import utils as _u

    rng = np.random.default_rng(0)
    B, H, KV, T = 1, 8, 4, 256

    def mk(hd, S=256):
        q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
        return q, k, v

    _u._seen_fallbacks.clear()
    with caplog.at_level(logging.WARNING, logger="crabml_tpu"):
        # decode: hd=128 eligible, hd=80 refused WITH a log line
        q, k, v = mk(128)
        assert decode_attention(q, k, v, jnp.asarray([5]), 0.1) is not None
        q, k, v = mk(80)
        assert decode_attention(q, k, v, jnp.asarray([5]), 0.1) is None
        assert any("decode_attention" in r.message for r in caplog.records)
        n_logs = len(caplog.records)
        # logged once per shape, not per call
        decode_attention(q, k, v, jnp.asarray([5]), 0.1)
        assert len(caplog.records) == n_logs

    # flash: hd=80 eligible (full-minor lane padding), hd=81 not
    qp = jnp.asarray(rng.standard_normal((B, T, H, 80)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((B, KV, T, 80)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((B, KV, T, 80)), jnp.float32)
    assert flash_attention(qp, kp, vp, jnp.zeros(B, jnp.int32), 0.1,
                           force=True) is not None
    qb = jnp.asarray(rng.standard_normal((B, T, H, 81)), jnp.float32)
    kb = jnp.asarray(rng.standard_normal((B, KV, T, 81)), jnp.float32)
    assert flash_attention(qb, kb, kb, jnp.zeros(B, jnp.int32), 0.1,
                           force=True) is None


@pytest.mark.parametrize("win", [64, 1024], ids=["local", "wider-than-ctx"])
def test_flash_softcap_and_window(win):
    """gemma2 features on the flash prefill kernel: softcap + sliding
    window match the XLA path, incl. out-of-window block skipping and a
    resumed cache offset."""
    from crabml_tpu.models import forward as fwd

    B, T, S, KV, G, hd = 2, 128, 512, 2, 2, 64
    H = KV * G
    softcap = 50.0
    rng = np.random.default_rng(win)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    pos = jnp.asarray([0, 250], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(q, k, v, pos, T, scale, softcap=softcap,
                         local_window=win)
    got = flash_attention(q, k, v, pos, scale, force=True, softcap=softcap,
                          local_window=jnp.int32(win))
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # traced win=0 == global (gemma2 alternating layers toggle in-scan)
    want_g = fwd.attention(q, k, v, pos, T, scale, softcap=softcap)
    got_g = flash_attention(q, k, v, pos, scale, force=True, softcap=softcap,
                            local_window=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=2e-5, atol=2e-5)
