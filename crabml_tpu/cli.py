"""CLI: generate or chat against a GGUF model.

Mirrors the reference CLI surface (crabml-cli/src/main.rs:29-64): model path,
steps, temperature/top-p, chat REPL, verbose metrics dump — TPU flags added
(dtype, tensor parallelism, backend).

  python -m crabml_tpu.cli model.gguf -p "Once upon a time" -n 128
  python -m crabml_tpu.cli model.gguf --chat
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="crabml-tpu")
    ap.add_argument("model", help="path to GGUF model file")
    ap.add_argument("-p", "--prompt", default="Once upon a time")
    ap.add_argument("-n", "--steps", type=int, default=300)
    ap.add_argument("-t", "--temperature", type=float, default=0.0)
    ap.add_argument("--probability", type=float, default=0.9, help="top-p")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--chat", action="store_true", help="interactive chat REPL")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--kv-dtype", default=None, choices=[None, "f32", "bf16", "int8"])
    ap.add_argument("--kv-lane-pad", action="store_true",
                    help="store the KV cache at 128-lane-rounded head_dim "
                         "so odd-head models (phi2 hd=80) ride the decode "
                         "kernel instead of the XLA fallback (costs "
                         "128/head_dim x cache HBM)")
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--tp", type=int, default=None, help="tensor parallel degree")
    ap.add_argument("--sp", type=int, default=None,
                    help="sequence parallel degree: shards the KV cache's "
                         "sequence axis over N devices (ring-attention "
                         "prefill), for contexts beyond one chip's HBM")
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas", "w4a8"])
    ap.add_argument("--prefill-w8", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="attach W8 prefill planes: unpack-free prefill "
                         "tiles at 82%% of the chip's matmul rate, costing "
                         "+8 bits/weight of HBM. Default: AUTO — enabled "
                         "(fully or partially) when the planes fit free "
                         "HBM on TPU; --no-prefill-w8 forces off")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="prompt-lookup speculative decoding with draft "
                         "length K (greedy only): drafts come from the "
                         "sequence's own history and verify in one fused "
                         "step, so accepted tokens ride the already-paid "
                         "weight streaming. Output is byte-identical to "
                         "plain greedy")
    ap.add_argument("--draft", metavar="GGUF", default=None,
                    help="two-model speculative decoding: path to a small "
                         "draft GGUF sharing the target's tokenizer; "
                         "implies --speculative 4 unless set. Greedy-exact")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mlock", action="store_true",
                    help="mlock(2) the weight mmap (reference --mlock parity)")
    ap.add_argument("--profile", action="store_true",
                    help="after generating, capture a profiler trace of 8 "
                         "decode steps and print the per-phase cost table "
                         "(the reference's --verbose metrics table, "
                         "main.rs:188-205, rebuilt from an XLA trace)")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from .gguf.reader import GGUFFile
    from .runtime.chat import ChatSession
    from .runtime.runner import Runner
    from .runtime.sampler import Sampler
    from .utils import enable_compilation_cache

    enable_compilation_cache()  # warm restarts skip XLA recompiles

    dtypes = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8, None: None}

    sharding = None
    if args.tp and args.tp > 1:
        from .parallel import make_mesh

        sharding = make_mesh(tp=args.tp, dp=1)

    if args.sp and args.sp > 1:
        from .parallel.sp import SequenceParallelRunner

        sp_runner = SequenceParallelRunner(
            args.model, sp=args.sp, tp=(args.tp or 1), seq_len=args.seq_len,
            compute_dtype=dtypes[args.dtype],
            sampler=(Sampler(temperature=args.temperature,
                             topp=args.probability)
                     if args.temperature > 0 else None),
        )
        t0 = time.perf_counter()
        print(args.prompt, end="", flush=True)
        n = 0
        for piece in sp_runner.prefill_and_generate(args.prompt, args.steps):
            print(piece, end="", flush=True)
            n += 1
        print(f"\n\n{n} tokens, {n / (time.perf_counter() - t0):.2f} tokens/s "
              f"(sp={args.sp})", file=sys.stderr)
        return 0

    gf = GGUFFile(args.model, mlock=args.mlock)
    if args.verbose:
        print("== metadata ==", file=sys.stderr)
        for k, v in gf.metadata.as_dict().items():
            s = str(v)
            print(f"  {k}: {s[:80]}{'...' if len(s) > 80 else ''}", file=sys.stderr)

    runner = Runner(
        gf,
        seq_len=args.seq_len,
        compute_dtype=dtypes[args.dtype],
        kv_dtype=dtypes[args.kv_dtype],
        sampler=Sampler(temperature=args.temperature, topp=args.probability),
        sharding=sharding,
        seed=args.seed,
        backend=args.backend,
        prefill_w8=args.prefill_w8,
        speculative=args.speculative,
        draft_model=args.draft,
        kv_lane_pad=args.kv_lane_pad,
    )

    if args.chat:
        session = ChatSession(runner)
        print("chat REPL — empty line or ctrl-d to exit", file=sys.stderr)
        while True:
            try:
                prompt = input(">> ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if not prompt:
                break
            for piece in session.reply(prompt):
                print(piece, end="", flush=True)
            session.finish()
            print()
        return 0

    t0 = time.perf_counter()
    print(args.prompt, end="", flush=True)
    for piece in runner.prefill_and_generate(args.prompt, args.steps):
        print(piece, end="", flush=True)
    wall = time.perf_counter() - t0
    print()

    m = runner.metrics
    toks = m.counts.get("tokens", 0)
    print(
        f"\n{toks} tokens, {m.tokens_per_sec():.2f} tokens/s, "
        f"prefill {m.times_ns.get('prefill', 0) / 1e6:.0f} ms, total {wall:.2f} s",
        file=sys.stderr,
    )
    if args.verbose:
        print(m.table(), file=sys.stderr)
    if args.profile:
        from .utils.profiling import profile_decode_step

        _, table, trace = profile_decode_step(runner)
        print(f"\n== decode phase breakdown (trace: {trace}) ==", file=sys.stderr)
        print(table, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
