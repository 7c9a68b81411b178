"""The model runner: jitted prefill/decode over a donated KV cache.

Equivalent surface to Llama2Runner (crabml-llama2/src/llama2.rs:45-182) —
prefill / generate / prefill_and_generate — but TPU-shaped:

- ONE compiled step per (batch, padded-length) bucket instead of per-op
  dispatch; prompt lengths pad to power-of-two buckets to bound recompiles.
- The KV cache is donated through jit, so decode updates in place on device.
- Sampling runs on device; only the sampled token ids cross to host.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..models.config import ModelConfig, config_from_gguf
from ..models.forward import KVCache, forward
from ..models.weights import fuse_weights, load_weights, repack_weights
from ..tokenizer import Tokenizer, Utf8Buf, tokenizer_from_gguf
from ..utils import bucket as _bucket
from ..utils.metrics import Metrics
from .sampler import Sampler


def _device_hbm_bytes() -> int:
    """Per-chip HBM: memory_stats when the backend exposes it, else a
    device-kind table (the tunneled axon backend reports device_kind but
    not always memory_stats)."""
    d = jax.devices()[0]
    try:
        stats = d.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    kind = d.device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "v6 lite" in kind:
        return 16 << 30
    if "v4" in kind or "v6" in kind:
        return 32 << 30
    if "v5p" in kind or "v5" in kind:
        return 95 << 30
    return 16 << 30


def _auto_w8_budget(gf: GGUFFile, cfg, batch: int, seq_len: int,
                    kv_dtype) -> int | None:
    """VERDICT r3 #3: decide (pre-load, from the GGUF header alone)
    whether W8 prefill planes fit HBM. Returns None (off), -1 (full
    augmentation fits), or a byte budget for partial augmentation
    (largest tensors first — see models.weights.augment_w8_weights).

    Auto-engages only on TPU (where prefill throughput matters) and only
    for files >1 GiB: small/test models keep bit-exact bf16-dequant
    prefill, so goldens pinned against the numpy oracle stay byte-stable.
    """
    if jax.default_backend() != "tpu":
        return None
    wbytes = os.path.getsize(gf.path)
    if wbytes < (1 << 30):
        return None
    # full-augmentation cost: every 2D matmul except the embedding
    full = sum(
        ti.n_elems for ti in gf.tensor_infos
        if len(ti.dimensions) == 2 and "token_embd" not in ti.name
    )
    full = int(full * 1.008)  # + per-512-chunk f32 scales
    kv_item = 1 if kv_dtype == jnp.int8 else 2
    kv = (2 * cfg.n_layers * batch * seq_len
          * cfg.n_kv_heads * cfg.head_dim * kv_item)
    slack = 2 << 30  # activations, compile scratch, serving KV pools
    budget = _device_hbm_bytes() - slack - wbytes - kv
    import logging

    log = logging.getLogger("crabml_tpu")
    if budget <= 0:
        log.info("prefill W8 planes auto-disabled: no HBM headroom "
                 "(weights %.1f GiB)", wbytes / 2**30)
        return None
    if budget >= full:
        log.info("prefill W8 planes auto-enabled (+%.1f GiB HBM, fits); "
                 "pass prefill_w8=False to disable", full / 2**30)
        return -1
    log.info("prefill W8 planes PARTIALLY auto-enabled: %.1f of %.1f GiB "
             "fits HBM; largest tensors augment first",
             budget / 2**30, full / 2**30)
    return budget


class Runner:
    def __init__(
        self,
        model: str | GGUFFile,
        seq_len: int | None = None,
        batch_size: int = 1,
        compute_dtype=jnp.float32,
        kv_dtype=None,
        sampler: Sampler | None = None,
        sharding=None,
        seed: int = 0,
        backend: str | None = None,
        scale_dtype=None,
        weight_cache: bool | None = None,
        prefill_w8: bool | None = None,
        speculative: int = 0,
        draft_model: "str | GGUFFile | None" = None,
        kv_lane_pad: bool = False,
    ):
        gf = GGUFFile(model) if not isinstance(model, GGUFFile) else model
        self.cfg: ModelConfig = config_from_gguf(gf.metadata)
        self.seq_len = min(seq_len or self.cfg.seq_len, self.cfg.seq_len)
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.kv_dtype = kv_dtype or compute_dtype
        self.tokenizer: Tokenizer = tokenizer_from_gguf(gf.metadata)
        self.sampler = sampler or Sampler()
        self.metrics = Metrics()
        self._key = jax.random.PRNGKey(seed)

        if backend is not None:
            from ..ops import matmul as matmul_mod

            matmul_mod.set_backend(backend)
            if backend == "auto":
                backend = matmul_mod._BACKEND
        with self.metrics.track("load"):
            layout = "kernel" if backend in ("pallas", "w4a8") else "planar"
            # bf16 scale planes are LOSSLESS under bf16 compute (the kernel
            # rounds scales to the compute dtype in-register either way) and
            # cut Q4_K weight bytes ~15%; f32 compute keeps f32 scales exact.
            if scale_dtype is None:
                scale_dtype = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
            sdt = "bf16" if scale_dtype in ("bf16", jnp.bfloat16) else np.float32
            # repacked-plane disk cache: the repack of a multi-GB file costs
            # ~80 s/7B on one core but is deterministic — warm starts load
            # the planes straight from .npy mmaps (runtime.weight_cache).
            # Default: on for files > 512 MB, single-device loads.
            from . import weight_cache as _wc

            if weight_cache is None:
                weight_cache = (
                    sharding is None
                    and os.path.getsize(gf.path) > 512 * 1024 * 1024
                )
            # W8 prefill planes (int8 storage, unpack-free prefill tiles;
            # +8 bits/weight HBM). prefill_w8=True: full augmentation
            # (legacy opt-in). None (the DEFAULT): auto — augment when the
            # planes fit free HBM, partially when only some do (largest
            # tensors first), never on CPU or for small models (so pinned
            # goldens stay byte-exact). False: off.
            w8_budget = None  # None=off, -1=full, >0 = partial byte budget
            if backend in ("pallas", "w4a8"):
                if prefill_w8 is True:
                    w8_budget = -1
                elif prefill_w8 is None and sharding is None:
                    w8_budget = _auto_w8_budget(
                        gf, self.cfg, batch_size, self.seq_len, self.kv_dtype)
            self.prefill_w8 = w8_budget is not None

            wc_root = _wc.default_root() if weight_cache else None
            # augmented planes cache under their own key (partial budgets
            # quantize to GiB so the key is stable across runs): warm
            # starts skip the deterministic augment pass too
            w8_tag = ("" if w8_budget is None
                      else ("+w8" if w8_budget == -1
                            else f"+w8b{w8_budget >> 30}"))
            wc_key = (_wc.cache_key(gf.path, layout + w8_tag, str(sdt))
                      if weight_cache else None)
            wc_key_base = (_wc.cache_key(gf.path, layout, str(sdt))
                           if weight_cache else None)
            host_weights = None
            if weight_cache:
                with self.metrics.track("load.cache_read"):
                    host_weights = _wc.load(wc_root, wc_key)
            if host_weights is None:
                base = (_wc.load(wc_root, wc_key_base)
                        if weight_cache and w8_budget is not None else None)
                if base is None:
                    with self.metrics.track("load.repack"):
                        base = load_weights(gf, self.cfg, layout, sdt)
                        if sharding is None:
                            # QKV/gate-up fusion is single-device only
                            # (fused rows would straddle q|k|v boundaries
                            # under row sharding)
                            base = fuse_weights(base, self.cfg)
                        if backend in ("pallas", "w4a8"):
                            base = repack_weights(base, self.cfg)  # stragglers
                    if weight_cache and w8_budget is not None:
                        # save the un-augmented planes too: other configs
                        # (decode-only, sharded) start from this entry
                        with self.metrics.track("load.cache_write"):
                            _wc.save(wc_root, wc_key_base, base)
                host_weights = base
                if w8_budget is not None:
                    with self.metrics.track("load.w8_augment"):
                        from ..models.weights import augment_w8_weights

                        host_weights = augment_w8_weights(
                            base,
                            None if w8_budget == -1 else w8_budget)
                if weight_cache:
                    with self.metrics.track("load.cache_write"):
                        _wc.save(wc_root, wc_key, host_weights)
            if sharding is not None:
                from ..parallel.tp import make_tp_forward

                with self.metrics.track("load.device_put"):
                    self._tp_step, self.weights = make_tp_forward(
                        host_weights, sharding, self.cfg, compute_dtype
                    )
            else:
                self._tp_step = None
                with self.metrics.track("load.device_put"):
                    self.weights = jax.tree.map(jax.device_put, host_weights)
                    jax.block_until_ready(self.weights)
        self._sharding = sharding

        # kv_lane_pad: store the cache at 128-lane-rounded head_dim so
        # odd-head models (phi2 hd=80) use the decode-attention kernel
        # instead of the XLA fallback (+HBM: 128/hd per cache byte)
        self.kv_lane_pad = kv_lane_pad
        self.cache = KVCache.create(self.cfg, batch_size, self.seq_len,
                                    self.kv_dtype, lane_pad=kv_lane_pad)
        if sharding is not None:
            from ..parallel.sharding import cache_sharding

            self.cache = jax.device_put(self.cache, cache_sharding(sharding))
        # NB: self.pos is replaced, never mutated in place — jnp.asarray()
        # transfers host buffers asynchronously, so in-place mutation after
        # passing it to a jitted call races the in-flight copy (observed as
        # nondeterministic generations under host load).
        self.pos = np.zeros(batch_size, dtype=np.int32)
        self._decode_buf = Utf8Buf()
        # speculative decoding: draft length (0 = off). Greedy, B=1,
        # single-device only; other configs fall back. Drafts come from
        # prompt lookup by default, or from a second small GGUF when
        # `draft_model` is given (two-model speculative decoding).
        self.speculative = speculative
        self._draft: "Runner | None" = None
        if draft_model is not None:
            if sharding is not None:
                from ..errors import UnsupportedError

                raise UnsupportedError(
                    "draft_model speculative decoding is single-device "
                    "(the speculative path requires an unsharded runner)"
                )
            self._draft = Runner(
                draft_model, seq_len=self.seq_len, batch_size=1,
                compute_dtype=compute_dtype, kv_dtype=kv_dtype,
                backend=backend, scale_dtype=scale_dtype,
                weight_cache=weight_cache,
            )
            if self._draft.cfg.vocab_size != self.cfg.vocab_size:
                from ..errors import UnsupportedError

                raise UnsupportedError(
                    f"draft model vocab {self._draft.cfg.vocab_size} != "
                    f"target vocab {self.cfg.vocab_size} — speculative "
                    "verify requires a shared tokenizer"
                )
            if self.speculative == 0:
                self.speculative = 4
        # token consumed at each cache position (drives the on-device
        # n-gram draft; correctness never depends on it — see
        # runtime.speculative — so a stale list only costs acceptance)
        self._consumed: list[int] = []

        if self._tp_step is not None:
            self._step = self._tp_step  # shard_map TP forward (parallel.tp)
            self._windowed = False
        else:
            self._step = jax.jit(
                partial(forward, cfg=self.cfg, compute_dtype=self.compute_dtype),
                donate_argnames=("cache",),
                static_argnames=("attn_window",),
            )
            self._windowed = True

    # ------------------------------------------------------------------
    def kv_cache_len(self) -> int:
        return int(self.pos[0])

    def reset(self):
        self.cache = KVCache.create(
            self.cfg, self.batch_size, self.seq_len, self.kv_dtype,
            lane_pad=self.kv_lane_pad,
        )
        if self._sharding is not None:
            from ..parallel.sharding import cache_sharding

            self.cache = jax.device_put(self.cache, cache_sharding(self._sharding))
        self.pos = np.zeros(self.batch_size, dtype=np.int32)
        self._decode_buf = Utf8Buf()
        self._consumed = []
        if self._draft is not None:
            self._draft.reset()

    MAX_PREFILL_CHUNK = 512  # bounds compile buckets AND activation memory

    def _forward_tokens(self, token_ids: list[int]):
        """Run `token_ids` through the model at the current position; returns
        last-token logits (1, V).

        Long prompts prefill in MAX_PREFILL_CHUNK pieces (chunked prefill):
        compile buckets stay bounded and a 32k prompt never materializes a
        32k-row activation. Prompts that exceed the cache keep their TAIL
        (sliding-window convention, matching the serving engine)."""
        limit = self.seq_len - 1 - int(self.pos[0])
        if limit <= 0:
            from ..errors import CacheError

            raise CacheError(
                f"KV cache full (pos={int(self.pos[0])}, seq_len={self.seq_len}); "
                "reset() or raise seq_len"
            )
        if len(token_ids) > limit:
            token_ids = token_ids[-limit:]
        while len(token_ids) > self.MAX_PREFILL_CHUNK:
            head, token_ids = (
                token_ids[: self.MAX_PREFILL_CHUNK],
                token_ids[self.MAX_PREFILL_CHUNK :],
            )
            self._forward_chunk(head)
        return self._forward_chunk(token_ids)

    def _forward_chunk(self, token_ids: list[int]):
        n = len(token_ids)
        # single-token decode must stay T=1: padding to the minimum prefill
        # bucket (8) would 8x the activation work AND route attention through
        # the prefill path instead of the T=1 decode kernel
        t_pad = 1 if n == 1 else _bucket(n)
        if int(self.pos[0]) + t_pad > self.seq_len:
            # bucket would overrun the cache (non-power-of-two seq_len or a
            # near-full cache): fall back to the exact remaining width
            t_pad = self.seq_len - int(self.pos[0])
        padded = np.zeros((self.batch_size, t_pad), dtype=np.int32)
        padded[0, :n] = token_ids
        if self._windowed:
            # attention window: smallest bucket covering every live slot —
            # decode cost tracks context length, not preallocated seq_len
            win = min(_bucket(int(self.pos.max()) + t_pad, 128), self.seq_len)
            logits, self.cache = self._step(
                self.weights, self.cache, jnp.asarray(padded),
                jnp.asarray(self.pos), attn_window=win,
            )
        else:
            logits, self.cache = self._step(
                self.weights, self.cache, jnp.asarray(padded), jnp.asarray(self.pos)
            )
        self.pos = self.pos + np.asarray([n] + [0] * (self.batch_size - 1), np.int32)
        self._consumed.extend(token_ids)
        return logits[:1, n - 1]

    def prefill(self, prompt: str, bos: bool = True) -> tuple[int, int, int]:
        """Tokenize + forward the prompt; returns (next_pos, last_prompt_token,
        first_generated_token) like the reference (llama2.rs:111-139)."""
        tokens = self.tokenizer.encode(prompt, bos=bos)
        if not tokens:
            raise ValueError("expected at least 1 prompt token")
        with self.metrics.track("prefill"):
            pos_before = self.pos.copy()
            logits = self._forward_tokens(tokens)
            if self._draft is not None:
                # the draft model consumes the same prompt from the same
                # position so its cache tracks the target's (stale draft
                # state only costs acceptance, never correctness — see
                # runtime.speculative.draft_model_loop)
                self._draft.pos = pos_before
                self._draft._forward_tokens(tokens)
            token = int(self._sample(logits)[0])
        return int(self.pos[0]), tokens[-1], token

    def _sample(self, logits):
        self._key, sub = jax.random.split(self._key)
        return self.sampler.sample(logits, sub)

    def generate(self, token: int, steps: int | None = None,
                 tick: int | None = None):
        """Greedy/sampled streaming generation from `token` (already sampled
        by prefill). Yields decoded text pieces; stops at EOS or seq_len.

        `tick` > 1 fuses that many decode steps per device dispatch
        (runtime.generate.decode_loop) and EOS-checks host-side afterwards
        — on a high-RTT link the per-dispatch round trip otherwise caps
        single-token decode far below the chip's rate. Default: 8 on TPU,
        1 elsewhere. Streaming granularity becomes `tick` tokens."""
        if tick is None:
            tick = 8 if jax.default_backend() == "tpu" else 1
        max_steps = self.seq_len - int(self.pos[0]) - 1
        if steps is not None:
            max_steps = min(max_steps, steps - 1)

        yield self.tokenizer.decode(token, self._decode_buf)
        current = token
        if (
            self.speculative > 0
            and self._tp_step is None
            and self.batch_size == 1
            and self.sampler.temperature == 0.0
        ):
            yield from self._generate_speculative(
                current, max_steps, self.speculative
            )
            return
        if tick > 1 and self._tp_step is None:
            yield from self._generate_ticked(current, max_steps, tick)
            return
        for _ in range(max_steps):
            with self.metrics.track("decode"):
                logits = self._forward_tokens([current])
                new_token = int(self._sample(logits)[0])
            self.metrics.count("tokens")
            if new_token == self.tokenizer.eos_token:
                return
            yield self.tokenizer.decode(new_token, self._decode_buf)
            current = new_token

    def _generate_ticked(self, current: int, max_steps: int, tick: int):
        from .generate import decode_loop

        remaining = max_steps
        while remaining > 0:
            n = min(tick, remaining)
            pos0 = int(self.pos[0])
            win = min(_bucket(pos0 + n, 128), self.seq_len)
            self._key, sub = jax.random.split(self._key)
            tok_in = np.full(self.batch_size, current, np.int32)
            with self.metrics.track("decode"):
                toks, self.cache, _ = decode_loop(
                    self.weights, self.cache, jnp.asarray(tok_in),
                    jnp.asarray(self.pos), sub, n, self.cfg,
                    self.compute_dtype,
                    temperature=self.sampler.temperature,
                    topp=self.sampler.topp, attn_window=win,
                )
                out = np.asarray(toks)[0]
            toks = [int(v) for v in out]
            for j, t in enumerate(toks):
                self.metrics.count("tokens")
                if t == self.tokenizer.eos_token:
                    # roll pos back to just after the EOS: positions beyond
                    # it hold discarded in-tick writes, which the next
                    # prefill overwrites before they become attendable
                    self.pos = np.asarray(
                        [pos0 + j + 1] + [0] * (self.batch_size - 1), np.int32
                    )
                    self._consumed.extend([current] + toks[:j])
                    return
                yield self.tokenizer.decode(t, self._decode_buf)
            self.pos = self.pos + np.asarray(
                [n] + [0] * (self.batch_size - 1), np.int32
            )
            self._consumed.extend([current] + toks[:-1])
            current = toks[-1]
            remaining -= n

    def _generate_speculative(self, current: int, max_steps: int, draft: int,
                              rounds: int = 4):
        """Prompt-lookup speculative decode (runtime.speculative): each
        dispatch runs `rounds` on-device draft+verify rounds, emitting
        1..draft+1 greedy-exact tokens per round. Falls back to the
        ticked loop near the cache end (a dispatch needs headroom for
        its worst-case rounds*(draft+1) advance). With a `draft_model`
        runner attached, drafts come from the small model's own greedy
        decode (runtime.speculative.draft_model_loop) instead of n-gram
        lookup — still greedy-exact."""
        from .speculative import draft_model_loop, speculative_loop

        S = self.seq_len
        emitted = 0
        while emitted < max_steps:
            pos0 = int(self.pos[0])
            if S - 1 - pos0 < rounds * (draft + 1):
                yield from self._generate_ticked(current, max_steps - emitted, 8)
                return
            win = min(_bucket(pos0 + rounds * (draft + 1), 128), S)
            with self.metrics.track("decode"):
                if self._draft is not None:
                    d = self._draft
                    outs, counts, self.cache, d.cache, _, _ = draft_model_loop(
                        self.weights, self.cache, d.weights, d.cache,
                        jnp.int32(current), jnp.int32(pos0), rounds, draft,
                        self.cfg, d.cfg, self.compute_dtype, attn_window=win,
                    )
                else:
                    hist = np.zeros(S, np.int32)
                    ncon = min(len(self._consumed), pos0)
                    if ncon:
                        hist[pos0 - ncon : pos0] = self._consumed[-ncon:]
                    outs, counts, self.cache, _, _, _ = speculative_loop(
                        self.weights, self.cache, jnp.asarray(hist),
                        jnp.int32(current), jnp.int32(pos0), rounds, draft,
                        self.cfg, self.compute_dtype, attn_window=win,
                    )
                outs = np.asarray(outs)
                counts = np.asarray(counts)
            toks: list[int] = []
            for r in range(rounds):
                toks.extend(int(t) for t in outs[r, : int(counts[r])])
            self.metrics.count("spec_rounds", rounds)
            self.metrics.count("spec_tokens", len(toks))
            for j, t in enumerate(toks):
                self.metrics.count("tokens")
                if t == self.tokenizer.eos_token:
                    self.pos = np.asarray([pos0 + j + 1], np.int32)
                    self._consumed.extend([current] + toks[:j])
                    return
                yield self.tokenizer.decode(t, self._decode_buf)
                emitted += 1
                if emitted >= max_steps:
                    # steps cap hit: t was yielded but never consumed;
                    # roll pos back exactly like the EOS case
                    self.pos = np.asarray([pos0 + j + 1], np.int32)
                    self._consumed.extend([current] + toks[:j])
                    return
            self.pos = np.asarray([pos0 + len(toks)], np.int32)
            self._consumed.extend([current] + toks[:-1])
            current = toks[-1]

    def save_session(self, path: str):
        """Persist the KV cache + position (chat session state) to .npz.

        The reference's closest analog is the in-memory persistent cache
        across chat turns (SURVEY §5.4); this adds durable save/restore so
        a long conversation survives a process restart without re-prefill.
        """
        extra = {}
        if self.cache.quantized:
            extra = {
                "k_scale": np.asarray(self.cache.k_scale),
                "v_scale": np.asarray(self.cache.v_scale),
            }
        np.savez(
            path,
            k=np.asarray(self.cache.k),
            v=np.asarray(self.cache.v),
            pos=self.pos,
            model_name=self.cfg.model_name,
            **extra,
        )

    def load_session(self, path: str):
        data = np.load(path, allow_pickle=False)
        if data["k"].shape != tuple(self.cache.k.shape):
            from ..errors import CacheError

            raise CacheError(
                f"session cache shape {data['k'].shape} != runner "
                f"{tuple(self.cache.k.shape)} (seq_len/batch/model mismatch)"
            )
        self.cache = KVCache(
            jnp.asarray(data["k"], self.kv_dtype),
            jnp.asarray(data["v"], self.kv_dtype),
            jnp.asarray(data["k_scale"]) if "k_scale" in data else None,
            jnp.asarray(data["v_scale"]) if "v_scale" in data else None,
        )
        if self._sharding is not None:
            from ..parallel.sharding import cache_sharding

            self.cache = jax.device_put(self.cache, cache_sharding(self._sharding))
        self.pos = data["pos"].astype(np.int32)
        self._decode_buf = Utf8Buf()
        # token history is not part of the session file; an empty list
        # only lowers speculative acceptance, never correctness
        self._consumed = []

    def prefill_and_generate(self, prompt: str, steps: int):
        _, _, token = self.prefill(prompt, bos=True)
        return self.generate(token, steps)
