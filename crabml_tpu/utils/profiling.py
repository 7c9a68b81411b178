"""Per-op observability from XLA profiler traces.

The reference instruments every tensor op with RAII nanosecond counters and
prints a sorted per-token cost table (TensorMetrics, metrics.rs:5-30;
main.rs:188-205). Inside one jitted TPU step host-side timers see nothing,
so the equivalent instrument is: jax.named_scope annotations in the forward
pass (models/forward.py) + a jax.profiler trace of one step, aggregated here
into the same kind of table. `CLI --profile` and bench.py's gap analysis
use this; the trace artifact itself can be opened in TensorBoard/Perfetto.
"""

from __future__ import annotations

import glob
import gzip
import json
import os


# phases annotated in models/forward.py (order = display order)
PHASES = [
    "embed",
    "attn_norm",
    "qkv_proj",
    "rope",
    "cache_update",
    "attention",
    "wo_proj",
    "ffn_norm",
    "ffn",
    "final_norm",
    "lm_head",
    "sample",
]


def capture_trace(fn, trace_dir: str):
    """Run `fn()` (which must block on its device work) under the profiler.
    Returns the path of the newest .trace.json.gz produced."""
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        fn()
    hits = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not hits:
        return None
    return max(hits, key=os.path.getmtime)


def _device_events(trace: dict):
    """Yield complete ('X') events from TPU/device tracks with their args."""
    # pid -> process name, to keep only device-side lanes
    pnames: dict[int, str] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pnames[ev.get("pid")] = (ev.get("args") or {}).get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pname = pnames.get(ev.get("pid"), "")
        low = pname.lower()
        if any(s in low for s in ("tpu", "device", "xla", "accelerator", "/device")):
            yield ev


def aggregate_phases(trace_path: str, phases=PHASES) -> dict:
    """Sum device-op durations per named-scope phase.

    XLA keeps named_scope strings in each HLO's op_name metadata; trace
    events carry it in args (tf_op/long_name) or in the event name for
    fusions. An op matching several scopes (fused across phases) counts
    toward the LAST phase found in its path (innermost scope). Returns
    {phase: microseconds} plus "_other" and "_total".
    """
    with gzip.open(trace_path, "rt") as f:
        trace = json.load(f)
    out = {p: 0.0 for p in phases}
    other = 0.0
    total = 0.0
    for ev in _device_events(trace):
        dur = float(ev["dur"])
        args = ev.get("args") or {}
        hay = " ".join(
            str(v) for v in (ev.get("name", ""), args.get("tf_op", ""),
                             args.get("long_name", ""), args.get("name", ""))
        )
        best = None
        best_pos = -1
        for p in phases:
            pos = hay.rfind(p)
            if pos > best_pos:
                best_pos = pos
                best = p
        total += dur
        if best is not None and best_pos >= 0:
            out[best] += dur
        else:
            other += dur
    out["_other"] = other
    out["_total"] = total
    return out


def phase_table(agg: dict, steps: int = 1) -> str:
    """Reference-style sorted cost table (main.rs:188-205), per step."""
    total = agg.get("_total", 0.0) or 1.0
    rows = [(k, v) for k, v in agg.items() if not k.startswith("_") and v > 0]
    rows.sort(key=lambda kv: -kv[1])
    lines = [f"{'phase':16s} {'ms/step':>10s} {'share':>7s}"]
    for k, v in rows:
        lines.append(f"{k:16s} {v / 1e3 / steps:10.3f} {v / total:6.1%}")
    lines.append(f"{'(unattributed)':16s} {agg.get('_other', 0) / 1e3 / steps:10.3f} "
                 f"{agg.get('_other', 0) / total:6.1%}")
    lines.append(f"{'total':16s} {total / 1e3 / steps:10.3f}")
    return "\n".join(lines)


def profile_decode_step(runner, steps: int = 8, trace_dir: str | None = None):
    """Capture `steps` fused decode steps of a Runner and return
    (aggregated phase dict, table string, trace path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.forward import KVCache
    from ..runtime.generate import decode_loop

    if trace_dir is None:
        trace_dir = os.path.join(
            os.path.dirname(__file__), "..", "..", ".cache", "traces"
        )
    trace_dir = os.path.abspath(trace_dir)
    B = runner.batch_size
    tok = jnp.ones(B, jnp.int32)
    pos = jnp.asarray(np.maximum(np.asarray(runner.pos), 64))
    key = jax.random.PRNGKey(0)

    def run():
        toks, cache, _ = decode_loop(
            runner.weights, runner.cache, tok, pos, key, steps,
            runner.cfg, runner.compute_dtype, attn_window=None,
        )
        runner.cache = cache
        jax.block_until_ready(toks)

    run()  # compile outside the trace
    path = capture_trace(run, trace_dir)
    if path is None:
        return None, "(no trace produced)", None
    agg = aggregate_phases(path)
    return agg, phase_table(agg, steps), path
