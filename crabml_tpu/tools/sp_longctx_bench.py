"""Characterize the sp long-context serving tier (VERDICT r4 #7).

The tier is deliberately B=1-serial: one sp-sharded cache owns the whole
mesh, queued requests wait (serving.sp_engine docstring). This tool makes
that contract MEASURABLE: it drives over-one-chip prompts through the
public HTTP API against a daemon running `--sp-longctx N` and reports
TTFT, decode rate, and the queue-wait the serial design imposes on
concurrent long requests.

Real multi-chip hardware is not available in this environment, so the
numbers come from the virtual CPU mesh (sp=N over
xla_force_host_platform_device_count devices) — they characterize the
TIER's behavior (serial queueing, TTFT composition), not chip
performance. Run on a real slice, the same tool produces the real row.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m crabml_tpu.tools.sp_longctx_bench \
        /root/reference/testdata/tinyllamas-stories-260k-f32.gguf \
        --sp 4 --seq-len 256 --requests 3 --max-tokens 24
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crabml-tpu-sp-longctx-bench")
    ap.add_argument("model")
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--prompt-tokens", type=int, default=None,
                    help="default: 60%% of seq_len (over one 'chip share' "
                         "= seq_len/sp, under the cache bound)")
    ap.add_argument("--requests", type=int, default=3)
    ap.add_argument("--max-tokens", type=int, default=24)
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="force an N-device virtual CPU mesh (wins over "
                         "the environment's forced platform)")
    args = ap.parse_args(argv)

    import os

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}")

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    if jax.device_count() < args.sp:
        print(f"need {args.sp} devices (pass --cpu-mesh 8 for the virtual "
              f"CPU mesh)", file=sys.stderr)
        return 1

    from ..parallel.sp import SequenceParallelRunner
    from ..serving import Request
    from ..serving.sp_engine import SpServingEngine

    runner = SequenceParallelRunner(args.model, sp=args.sp,
                                    seq_len=args.seq_len)
    eng = SpServingEngine(runner)
    threading.Thread(target=eng.run_forever, daemon=True).start()

    P = args.prompt_tokens or int(args.seq_len * 0.6)
    # a P-token prompt: encode a repeated story and trim
    base = ("Once upon a time there was a little girl who liked to play "
            "in the garden with her friends. ")
    ids = eng.tokenizer.encode(base * 40, bos=True)[:P]
    text = eng.tokenizer.decode_tokens(ids[1:])

    # warm compile: one request end to end
    eng.generate([text], max_tokens=4)

    reqs = [eng.submit(Request(prompt=text, max_tokens=args.max_tokens))
            for _ in range(args.requests)]
    t0 = time.perf_counter()
    while any(r.finish_reason is None for r in reqs):
        time.sleep(0.02)
    wall = time.perf_counter() - t0

    ttfts = [r._t_first - r._t_submit for r in reqs]
    e2es = [r._t_finish - r._t_submit for r in reqs]
    toks = sum(len(r.output_tokens) for r in reqs)
    result = {
        "metric": "sp_longctx_tier",
        "mesh": f"sp={args.sp} over {jax.device_count()} "
                f"{jax.devices()[0].platform} devices",
        "prompt_tokens": P,
        "seq_len": args.seq_len,
        "requests": args.requests,
        "max_tokens": args.max_tokens,
        "wall_s": round(wall, 2),
        "tokens_per_sec": round(toks / wall, 2),
        # serial tier: request i's TTFT ≈ its queue wait (≈ i completed
        # requests) + one prefill — the documented queueing contract,
        # now measured. TTFTs should step up by ~one e2e each.
        "ttft_s": sorted(round(t, 2) for t in ttfts),
        "e2e_s": sorted(round(t, 2) for t in e2es),
        "serial_queue_step_s": round(
            (max(ttfts) - min(ttfts)) / max(len(reqs) - 1, 1), 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
