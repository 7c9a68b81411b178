"""Scaling-efficiency harness for the replica serving front.

BASELINE.json target: >= 85% scaling efficiency at 2+ hosts. Efficiency is
aggregate decode throughput per replica at N replicas vs at 1:

    eff(N) = (tok_s(N) / N) / tok_s(1)

Two modes:
- `--spawn N`: spawn N replica daemons of serving.http as subprocesses on
  THIS host (CPU backend or the local chip) — a single-machine rehearsal
  of the topology; real multi-host numbers need real hosts.
- `--replicas h1:8000,h2:8000`: measure against already-running replicas
  (the real multi-host deployment — one serving.http per host, router in
  front). This is the harness to run when 2+ TPU hosts exist; see
  BASELINE.md for why the >= 85% row is hardware-blocked in this repo.

Output: one JSON line per replica count with aggregate tok/s + efficiency.
"""

from __future__ import annotations

import json
import subprocess
import sys
import threading
import time
import urllib.request


def _wait_healthy(address: str, timeout: float = 300.0) -> bool:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        try:
            with urllib.request.urlopen(f"http://{address}/health", timeout=5) as r:
                if json.loads(r.read()).get("status") == "ok":
                    return True
        except OSError:
            time.sleep(0.5)
    return False


def drive(addresses: list[str], n_requests: int, max_tokens: int,
          prompt: str = "Once upon a time") -> dict:
    """Concurrent requests through a Router over `addresses`; returns
    aggregate completion tokens/sec (wall-clock, all requests)."""
    from ..serving.router import Router

    router = Router(addresses)
    results = []
    errors = []

    def one(i):
        try:
            _, resp = router.forward({
                "prompt": f"{prompt} {i}",
                "max_tokens": max_tokens,
                "temperature": 0.0,
            })
            try:
                data = json.loads(resp.read())
            finally:
                resp.close()
            results.append(data["usage"]["completion_tokens"])
        except Exception as e:  # harness: record, don't crash the run
            errors.append(repr(e))

    t0 = time.monotonic()
    threads = [threading.Thread(target=one, args=(i,)) for i in range(n_requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    toks = sum(results)
    return {
        "replicas": len(addresses),
        "requests": n_requests,
        "completed": len(results),
        "errors": errors[:3],
        "tokens": toks,
        "seconds": round(dt, 2),
        "tok_s": round(toks / dt, 2) if dt > 0 else 0.0,
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="crabml-tpu-scaling-bench")
    ap.add_argument("model", nargs="?", help="GGUF (required with --spawn)")
    ap.add_argument("--spawn", type=int, default=0,
                    help="spawn this many local replica daemons")
    ap.add_argument("--replicas", default=None,
                    help="comma list of running replica addresses")
    ap.add_argument("--port-base", type=int, default=8100)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"],
                    help="replica compute dtype (use f32 for CPU rehearsals)")
    args = ap.parse_args(argv)

    procs: list[subprocess.Popen] = []
    try:
        if args.spawn:
            assert args.model, "--spawn needs a model path"
            addresses = []
            for i in range(args.spawn):
                port = args.port_base + i
                procs.append(subprocess.Popen(
                    [sys.executable, "-m", "crabml_tpu.serving.http",
                     args.model, "--port", str(port),
                     "--slots", str(args.slots), "--dtype", args.dtype],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                ))
                addresses.append(f"127.0.0.1:{port}")
            for a in addresses:
                assert _wait_healthy(a), f"replica {a} never became healthy"
        else:
            assert args.replicas, "need --spawn or --replicas"
            addresses = args.replicas.split(",")

        base = drive(addresses[:1], args.requests, args.max_tokens)
        print(json.dumps({**base, "efficiency": 1.0}))
        if len(addresses) > 1:
            full = drive(addresses, args.requests, args.max_tokens)
            eff = (full["tok_s"] / len(addresses)) / max(base["tok_s"], 1e-9)
            print(json.dumps({**full, "efficiency": round(eff, 3)}))
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    main()
