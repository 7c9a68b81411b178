"""Minimal OpenAI-style HTTP front-end over ServingEngine.

Stdlib-only (http.server): POST /v1/completions with
  {"prompt": str, "max_tokens": int, "temperature": float, "top_p": float,
   "min_p": float, "repetition_penalty": float, "stop": [...], "stream": bool,
   "logprobs": int (completions) / bool + "top_logprobs" (chat) — per-token
   sampled logprob + top-N alternatives on NON-streamed responses}
-> {"id", "choices": [{"text", "finish_reason"}], "usage": {...}}, or
chunked text/event-stream when "stream" is true. POST /v1/chat/completions
takes OpenAI "messages" instead of "prompt": the conversation renders
through the GGUF's own tokenizer.chat_template (Jinja, sandboxed) when
present, else the built-in four-format heuristic (runtime.chat), with the
template's turn-end mark auto-added as a stop sequence; responses are
"chat.completion" / streamed "chat.completion.chunk" deltas. GET /health
reports slot occupancy. The engine loop runs on a dedicated thread; handler threads only
enqueue and wait on per-request queues, so many in-flight requests
continuously batch onto the slot pool.

The reference has no serving daemon (SURVEY §2.12); this is the host-side
routing layer BASELINE.json requires — in a multi-host deployment one of
these runs per model replica behind any off-the-shelf LB, with DCN only
carrying requests/responses (weights and KV never leave the replica's ICI
domain).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..runtime.sampler import LOGPROB_TOPK
from .engine import Request, ServingEngine


def make_handler(engine: ServingEngine, longctx=None):
    """`longctx`: optional serving.sp_engine.SpServingEngine — requests
    whose prompt + max_tokens exceed the primary engine's per-slot cache
    route there (the sequence-parallel long-context tier, SURVEY §5.7)
    instead of being sliding-window-trimmed."""

    def _route(req: Request):
        if longctx is None:
            return engine
        if not req.prompt_tokens:
            req.prompt_tokens = engine.tokenizer.encode(req.prompt, bos=True)
        if len(req.prompt_tokens) + req.max_tokens >= engine.seq_len:
            return longctx
        return engine

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, message: str, etype: str = "invalid_request_error"):
            # OpenAI error envelope: clients read error.message/error.type
            self._json(code, {"error": {
                "message": message, "type": etype, "param": None, "code": None,
            }})

        def do_GET(self):
            if self.path == "/health":
                import time

                uptime = (
                    time.monotonic() - engine._started if engine._started else 0.0
                )
                body = {
                    "status": "ok",
                    "model": engine.cfg.model_name,
                    "slots_total": engine.n_slots,
                    "slots_busy": sum(r is not None for r in engine.slots),
                    "steps": engine.steps,
                    "tokens_generated": engine.tokens_generated,
                    "tokens_per_sec": round(engine.tokens_generated / uptime, 2)
                    if uptime > 0
                    else 0.0,
                }
                if hasattr(engine, "pages_free"):
                    body["pages_free"] = engine.pages_free()
                if hasattr(engine, "prefix_hits"):
                    body["prefix_hits"] = engine.prefix_hits
                    body["prefix_tokens_reused"] = engine.prefix_tokens_reused
                self._json(200, body)
            elif self.path == "/metrics":  # Prometheus text exposition
                import time

                uptime = (
                    time.monotonic() - engine._started if engine._started else 0.0
                )
                rows = [
                    ("crabml_slots_total", "gauge", engine.n_slots),
                    ("crabml_slots_busy", "gauge",
                     sum(r is not None for r in engine.slots)),
                    ("crabml_spec_ticks_total", "counter", engine.spec_ticks),
                    ("crabml_spec_tokens_total", "counter",
                     engine.spec_tokens),
                    ("crabml_requests_submitted_total", "counter",
                     engine.requests_submitted),
                    ("crabml_requests_completed_total", "counter",
                     engine.requests_completed),
                    ("crabml_decode_steps_total", "counter", engine.steps),
                    ("crabml_tokens_generated_total", "counter",
                     engine.tokens_generated),
                    ("crabml_uptime_seconds", "gauge", round(uptime, 3)),
                ]
                if hasattr(engine, "pages_free"):
                    rows.append(("crabml_kv_pages_free", "gauge",
                                 engine.pages_free()))
                if hasattr(engine, "prefix_hits"):
                    rows += [
                        ("crabml_prefix_hits_total", "counter",
                         engine.prefix_hits),
                        ("crabml_prefix_tokens_reused_total", "counter",
                         engine.prefix_tokens_reused),
                        ("crabml_prefix_evictions_total", "counter",
                         engine.prefix_evictions),
                        ("crabml_preemptions_total", "counter",
                         engine.preemptions),
                    ]
                extra = ""
                if longctx is not None:
                    # the sp long-context tier is B=1-serial by design
                    # (one sp-sharded cache owns the mesh), so its queue
                    # depth + wait are the tier's load signal
                    rows += [
                        ("crabml_sp_queue_depth", "gauge",
                         longctx.queue_depth),
                        ("crabml_sp_busy", "gauge",
                         sum(r is not None for r in longctx.slots)),
                        ("crabml_sp_requests_submitted_total", "counter",
                         longctx.requests_submitted),
                        ("crabml_sp_requests_completed_total", "counter",
                         longctx.requests_completed),
                        ("crabml_sp_tokens_generated_total", "counter",
                         longctx.tokens_generated),
                    ]
                    extra = (
                        longctx.queue_wait_hist.render(
                            "crabml_sp_queue_wait_seconds")
                        + longctx.ttft_hist.render("crabml_sp_ttft_seconds")
                        + longctx.e2e_hist.render(
                            "crabml_sp_request_duration_seconds"))
                body = (
                    "".join(f"# TYPE {n} {t}\n{n} {v}\n" for n, t, v in rows)
                    + engine.ttft_hist.render("crabml_ttft_seconds")
                    + engine.e2e_hist.render(
                        "crabml_request_duration_seconds")
                    + extra
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/v1/models":  # OpenAI client discovery
                self._json(200, {
                    "object": "list",
                    "data": [{
                        "id": engine.cfg.model_name,
                        "object": "model",
                        "owned_by": "crabml-tpu",
                    }],
                })
            else:
                self._error(404, "not found", "not_found_error")

        def _build_request(self, payload, prompt: str, extra_stop=()):
            """Shared sampling/stop/bias parsing for both POST routes."""
            stop = payload.get("stop") or []
            if isinstance(stop, str):  # OpenAI allows a bare string
                stop = [stop]
            if not all(isinstance(s, str) for s in stop):
                raise ValueError("stop must be a string or list of strings")
            stop = list(stop) + [s for s in extra_stop if s not in stop]
            lb = payload.get("logit_bias") or {}
            if not isinstance(lb, dict):
                raise ValueError("logit_bias must be a {token_id: bias} map")
            logit_bias = tuple(sorted((int(k), float(v)) for k, v in lb.items()))
            # OpenAI logprobs: completions passes an int top-N (0 = sampled
            # token only); chat passes logprobs: bool (+ top_logprobs: int)
            lp = payload.get("logprobs")
            if isinstance(lp, bool):
                lp = int(payload.get("top_logprobs") or 0) if lp else None
            elif lp is not None:
                lp = int(lp)
            if lp is not None and not 0 <= lp <= LOGPROB_TOPK:
                raise ValueError(f"logprobs must be between 0 and {LOGPROB_TOPK}")
            return Request(
                prompt=prompt,
                max_tokens=int(payload.get("max_tokens", 256)),
                temperature=float(payload.get("temperature", 0.0)),
                topp=float(payload.get("top_p", 0.9)),
                minp=float(payload.get("min_p", 0.0)),
                repetition_penalty=float(payload.get("repetition_penalty", 1.0)),
                frequency_penalty=float(payload.get("frequency_penalty", 0.0)),
                presence_penalty=float(payload.get("presence_penalty", 0.0)),
                logit_bias=logit_bias,
                stop=tuple(s for s in stop if s),
                logprobs=lp,
            )

        def _piece(self, tid: int) -> str:
            return engine.tokenizer.decode_bytes(tid).decode("utf-8", "replace")

        def _logprobs_obj(self, req: Request, chat: bool):
            """OpenAI-shaped logprobs for a finished request (or None).
            Non-streamed responses only; aligned with output_tokens."""
            if req.logprobs is None:
                return None
            pairs = list(zip(req.output_tokens, req.output_logprobs))
            if chat:
                content = []
                for i, (t, l) in enumerate(pairs):
                    entry = {"token": self._piece(t), "logprob": l}
                    if req.logprobs > 0 and i < len(req.output_top_logprobs):
                        entry["top_logprobs"] = [
                            {"token": self._piece(tid), "logprob": tl}
                            for tid, tl in req.output_top_logprobs[i]
                        ]
                    content.append(entry)
                return {"content": content}
            obj = {
                "tokens": [self._piece(t) for t, _ in pairs],
                "token_logprobs": [l for _, l in pairs],
            }
            if req.logprobs > 0:
                obj["top_logprobs"] = [
                    {self._piece(tid): tl for tid, tl in top}
                    for top in req.output_top_logprobs[: len(pairs)]
                ]
            return obj

        def _stream_sse(self, stream, make_event, on_disconnect=None):
            """Drain a token stream as chunked SSE; make_event(piece|None)
            returns the JSON-able event (None piece = final event). A
            client disconnect mid-stream calls on_disconnect (which
            cancels the engine request instead of decoding for nobody)."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")

            try:
                while True:
                    piece = stream.get()
                    if piece is None:
                        break
                    ev = make_event(piece)
                    chunk(b"data: " + json.dumps(ev).encode() + b"\n\n")
                final = make_event(None)
                if final is not None:
                    chunk(b"data: " + json.dumps(final).encode() + b"\n\n")
                chunk(b"data: [DONE]\n\n")
                chunk(b"")
            except (BrokenPipeError, ConnectionResetError):
                if on_disconnect is not None:
                    on_disconnect()

        def do_POST(self):
            if self.path not in (
                "/v1/completions", "/generate", "/v1/chat/completions",
                "/tokenize", "/detokenize",
            ):
                self._error(404, "not found", "not_found_error")
                return
            chat = self.path == "/v1/chat/completions"
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/tokenize":  # llama.cpp-server parity
                    self._json(200, {"tokens": engine.tokenizer.encode(
                        str(payload.get("content", "")),
                        bos=bool(payload.get("add_special", False)))})
                    return
                if self.path == "/detokenize":
                    toks = payload.get("tokens") or []
                    if not all(isinstance(t, int) for t in toks):
                        raise ValueError("tokens must be a list of ints")
                    self._json(200, {"content": engine.tokenizer.decode_tokens(toks)})
                    return
                n_choices = int(payload.get("n", 1))
                if not 1 <= n_choices <= engine.n_slots:
                    raise ValueError(
                        f"n must be between 1 and {engine.n_slots} "
                        "(the engine's slot count)")
                if chat:
                    from ..runtime.chat import render_messages

                    messages = payload.get("messages")
                    if not isinstance(messages, list) or not messages:
                        raise ValueError("messages must be a non-empty list")
                    prompt, stop_mark = render_messages(
                        engine.cfg, messages, engine.tokenizer
                    )
                    reqs = [self._build_request(payload, prompt, (stop_mark,))
                            for _ in range(n_choices)]
                else:
                    reqs = [
                        self._build_request(payload, payload.get("prompt", ""))
                        for _ in range(n_choices)
                    ]
                req = reqs[0]
                target = _route(req)  # sp long-context tier when attached
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                self._error(400, str(e))
                return

            if payload.get("stream") and n_choices > 1:
                # OpenAI n>1 streaming: per-choice indexed chunks, all
                # choices decode concurrently (they share engine ticks)
                streams = [target.enqueue_streaming(r) for r in reqs]
                merged: "queue.SimpleQueue" = queue.SimpleQueue()

                def pump(i, st):
                    while True:
                        piece = st.get()
                        merged.put((i, piece))
                        if piece is None:
                            return

                for i, st in enumerate(streams):
                    threading.Thread(target=pump, args=(i, st),
                                     daemon=True).start()
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(data: bytes):
                    self.wfile.write(
                        f"{len(data):X}\r\n".encode() + data + b"\r\n")

                live = n_choices
                try:
                    while live:
                        i, piece = merged.get()
                        if piece is None:
                            live -= 1
                            if chat:
                                ev = {
                                    "id": f"chatcmpl-{req.request_id}",
                                    "object": "chat.completion.chunk",
                                    "model": engine.cfg.model_name,
                                    "choices": [{"index": i, "delta": {},
                                                 "finish_reason":
                                                     reqs[i].finish_reason}],
                                }
                            else:
                                ev = None
                            if ev is None:
                                continue
                        elif chat:
                            ev = {
                                "id": f"chatcmpl-{req.request_id}",
                                "object": "chat.completion.chunk",
                                "model": engine.cfg.model_name,
                                "choices": [{"index": i,
                                             "delta": {"content": piece}}],
                            }
                        else:
                            ev = {"index": i, "text": piece}
                        chunk(b"data: " + json.dumps(ev).encode() + b"\n\n")
                    if (payload.get("stream_options") or {}).get(
                            "include_usage"):
                        usage_ev = {"usage": {
                            "prompt_tokens": len(req.prompt_tokens),
                            "completion_tokens": sum(
                                len(r.output_tokens) for r in reqs),
                            "total_tokens": len(req.prompt_tokens) + sum(
                                len(r.output_tokens) for r in reqs),
                        }}
                        chunk(b"data: " + json.dumps(usage_ev).encode()
                              + b"\n\n")
                    chunk(b"data: [DONE]\n\n")
                    chunk(b"")
                except (BrokenPipeError, ConnectionResetError):
                    for r in reqs:
                        target.cancel(r)
                return

            if payload.get("stream"):
                want_usage = bool(
                    (payload.get("stream_options") or {}).get("include_usage"))

                def usage_now():
                    return {
                        "prompt_tokens": len(req.prompt_tokens),
                        "completion_tokens": len(req.output_tokens),
                        "total_tokens": len(req.prompt_tokens)
                        + len(req.output_tokens),
                    }

                stream = target.enqueue_streaming(req)
                if chat:
                    base = {
                        "id": f"chatcmpl-{req.request_id}",
                        "object": "chat.completion.chunk",
                        "model": engine.cfg.model_name,
                    }

                    def chat_event(piece):
                        if piece is not None:
                            return {**base, "choices": [
                                {"index": 0, "delta": {"content": piece}}]}
                        final = {**base, "choices": [
                            {"index": 0, "delta": {},
                             "finish_reason": req.finish_reason}]}
                        if want_usage:  # OpenAI stream_options.include_usage
                            final["usage"] = usage_now()
                        return final

                    self._stream_sse(
                        stream, chat_event,
                        on_disconnect=lambda: target.cancel(req),
                    )
                else:
                    self._stream_sse(
                        stream,
                        lambda piece: {"text": piece} if piece is not None
                        else ({"usage": usage_now()} if want_usage else None),
                        on_disconnect=lambda: target.cancel(req),
                    )
                return

            streams = [target.enqueue_streaming(r) for r in reqs]
            texts = []
            for r, stream in zip(reqs, streams):
                parts = []
                while True:
                    piece = stream.get()
                    if piece is None:
                        break
                    parts.append(piece)
                texts.append(
                    r.output_text if r.output_text is not None
                    else "".join(parts)
                )
            usage = {
                "prompt_tokens": len(req.prompt_tokens),
                "completion_tokens": sum(len(r.output_tokens) for r in reqs),
                "total_tokens": len(req.prompt_tokens)
                + sum(len(r.output_tokens) for r in reqs),
            }
            if payload.get("echo") and not chat:  # OpenAI completions echo
                texts = [req.prompt + t for t in texts]
            if chat:
                self._json(
                    200,
                    {
                        "id": f"chatcmpl-{req.request_id}",
                        "object": "chat.completion",
                        "model": engine.cfg.model_name,
                        "choices": [
                            {
                                "index": i,
                                "message": {"role": "assistant",
                                            "content": texts[i]},
                                "logprobs": self._logprobs_obj(r, chat=True),
                                "finish_reason": r.finish_reason,
                            }
                            for i, r in enumerate(reqs)
                        ],
                        "usage": usage,
                    },
                )
            else:
                self._json(
                    200,
                    {
                        "id": f"cmpl-{req.request_id}",
                        "object": "text_completion",
                        "model": engine.cfg.model_name,
                        "choices": [
                            {
                                "index": i,
                                "text": texts[i],
                                "logprobs": self._logprobs_obj(r, chat=False),
                                "finish_reason": r.finish_reason,
                            }
                            for i, r in enumerate(reqs)
                        ],
                        "usage": usage,
                    },
                )

    return Handler


def serve(engine: ServingEngine, host: str = "0.0.0.0", port: int = 8000,
          longctx=None):
    """Run the engine loop(s) + HTTP server until interrupted. `longctx`:
    optional SpServingEngine for over-one-chip contexts (see make_handler)."""
    loop = threading.Thread(target=engine.run_forever, daemon=True)
    loop.start()
    if longctx is not None:
        threading.Thread(target=longctx.run_forever, daemon=True).start()
    server = ThreadingHTTPServer((host, port), make_handler(engine, longctx))
    try:
        server.serve_forever()
    finally:
        engine.shutdown()
        if longctx is not None:
            longctx.shutdown()
        server.server_close()


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    from ..runtime.runner import Runner
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(prog="crabml-tpu-serve")
    ap.add_argument("model", help="path to GGUF model file")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--paged", action="store_true",
                    help="paged KV pool (memory scales with tokens in flight)")
    ap.add_argument("--pages", type=int, default=256, help="pool size with --paged")
    ap.add_argument("--no-prefix-cache", action="store_true",
                    help="disable automatic prompt-prefix page reuse (--paged)")
    ap.add_argument("--tick-tokens", type=int, default=1,
                    help="fused decode steps per dispatch (raise on high-RTT links)")
    ap.add_argument("--kv-lane-pad", action="store_true",
                    help="128-lane-padded KV cache/pool: odd-head models "
                         "(phi2 hd=80) ride the decode kernel")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="speculative serving: verify K drafted tokens per "
                         "tick (greedy requests only). Drafts come from "
                         "prompt lookup, or from --draft's small model")
    ap.add_argument("--draft", metavar="GGUF", default=None,
                    help="small draft GGUF for two-model speculative "
                         "serving (defaults the draft length when "
                         "--speculative is unset)")
    ap.add_argument("--repeat-window", type=int, default=None,
                    help="repetition/frequency/presence penalty window "
                         "(llama.cpp repeat_last_n; default 64)")
    ap.add_argument("--sp-longctx", type=int, default=0, metavar="N",
                    help="attach a sequence-parallel long-context tier "
                         "over N devices: requests whose prompt+max_tokens "
                         "exceed --seq-len stream through the sp mesh "
                         "(B=1, serial) instead of being trimmed")
    ap.add_argument("--sp-seq-len", type=int, default=None,
                    help="context budget of the sp tier (default: the "
                         "model's full seq_len)")
    args = ap.parse_args(argv)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    runner = Runner(
        args.model, seq_len=args.seq_len, compute_dtype=dt, backend=args.backend,
        kv_lane_pad=args.kv_lane_pad, draft_model=args.draft,
    )
    if args.paged:
        from .paged import PagedServingEngine

        engine = PagedServingEngine(
            runner, n_slots=args.slots, seq_len=args.seq_len, n_pages=args.pages,
            tick_tokens=args.tick_tokens, prefix_cache=not args.no_prefix_cache,
            speculative=args.speculative, repeat_window=args.repeat_window,
        )
    else:
        engine = ServingEngine(runner, n_slots=args.slots, seq_len=args.seq_len,
                               tick_tokens=args.tick_tokens,
                               speculative=args.speculative,
                               repeat_window=args.repeat_window)
    longctx = None
    if args.sp_longctx:
        from ..parallel.sp import SequenceParallelRunner
        from .sp_engine import SpServingEngine

        sp_runner = SequenceParallelRunner(
            args.model, sp=args.sp_longctx, seq_len=args.sp_seq_len,
            compute_dtype=dt,
        )
        longctx = SpServingEngine(sp_runner)
        print(f"long-context tier: sp={args.sp_longctx}, "
              f"seq_len={sp_runner.seq_len}")
    print(f"serving {engine.cfg.model_name} on {args.host}:{args.port} "
          f"({args.slots} slots, seq_len={engine.seq_len})")
    serve(engine, args.host, args.port, longctx=longctx)


if __name__ == "__main__":
    main()
