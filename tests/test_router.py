"""Request router (serving.router): the DCN-facing multi-replica front.

E2E: two real replica daemons (subprocesses, CPU platform) behind the
router, concurrent requests routed + streamed, failure handling, and the
scaling harness's drive loop."""

import json
import subprocess
import sys
import threading
import time
import urllib.request

import pytest

from crabml_tpu.serving.router import Replica, Router, make_handler


def test_pick_least_outstanding_and_backoff():
    r = Router(["a:1", "b:1", "c:1"])
    p1 = r.pick()
    p2 = r.pick()
    p3 = r.pick()
    assert {p1.address, p2.address, p3.address} == {"a:1", "b:1", "c:1"}
    # all outstanding=1; release one -> it is picked next
    r.release(p2)
    assert r.pick() is p2
    # a failed replica backs off and is skipped
    p1.mark_failed()
    assert not p1.alive
    picked = {r.pick().address for _ in range(4)}
    assert p1.address not in picked
    # recovery clears the backoff
    p1.mark_ok()
    assert p1.alive


def _spawn_replica(model: str, port: int) -> subprocess.Popen:
    # the axon sitecustomize force-sets JAX_PLATFORMS, so the subprocess
    # must flip to CPU in-process before first backend use
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from crabml_tpu.serving.http import main;"
        # f32: this jax build's CPU backend lacks the bf16 dot thunk
        # paged replicas: the fleet-summed metrics include the prefix-
        # cache counters (hits/reused/evictions) — VERDICT r3 #7
        f"main([{model!r},'--port','{port}','--slots','2',"
        f"'--host','127.0.0.1','--dtype','f32','--paged','--pages','32'])"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def _wait_health(address: str, timeout: float = 180.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        try:
            with urllib.request.urlopen(f"http://{address}/health", timeout=5) as r:
                if json.loads(r.read()).get("status") == "ok":
                    return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(address)


@pytest.fixture(scope="module")
def two_replicas(stories260k_path):
    procs, addrs = [], []
    base = 8410
    for i in range(2):
        procs.append(_spawn_replica(stories260k_path, base + i))
        addrs.append(f"127.0.0.1:{base + i}")
    try:
        for a in addrs:
            _wait_health(a)
        yield addrs
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def _start_router(addrs):
    from http.server import ThreadingHTTPServer

    router = Router(addrs)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(router))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return router, server, server.server_address[1]


def test_routed_requests_end_to_end(two_replicas):
    """Concurrent requests spread over both replicas; outputs are the same
    deterministic greedy text a direct request produces."""
    router, server, port = _start_router(two_replicas)
    try:
        # direct reference from replica 0
        body = json.dumps({"prompt": "Lily is a cat", "max_tokens": 8}).encode()
        req = urllib.request.Request(
            f"http://{two_replicas[0]}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            want = json.loads(r.read())["choices"][0]["text"]

        outs = []
        errs = []

        def one():
            try:
                rq = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/completions", data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(rq, timeout=180) as r:
                    outs.append(json.loads(r.read())["choices"][0]["text"])
            except Exception as e:
                errs.append(repr(e))

        threads = [threading.Thread(target=one) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert outs == [want] * 4

        # both replicas actually served tokens
        h = router.health()
        assert h["status"] == "ok"
        per_replica = [x.get("tokens_generated", 0) for x in h["replicas"]]
        assert sum(per_replica) >= 4 * 8
        assert all(n > 0 for n in per_replica), per_replica
    finally:
        server.shutdown()


def test_routed_streaming(two_replicas):
    _, server, port = _start_router(two_replicas)
    try:
        body = json.dumps({"prompt": "Once upon a time", "max_tokens": 6,
                           "stream": True}).encode()
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=180) as r:
            raw = r.read().decode()
        assert "data:" in raw and "[DONE]" in raw
    finally:
        server.shutdown()


def test_dead_replica_degrades_not_fails(two_replicas):
    """One bogus address in the pool: requests still complete via the
    live replicas; health marks the dead one."""
    addrs = [two_replicas[0], "127.0.0.1:1"]  # port 1: connection refused
    router, server, port = _start_router(addrs)
    try:
        body = json.dumps({"prompt": "Tom and Jane", "max_tokens": 4}).encode()
        for _ in range(3):
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/completions", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=120) as r:
                out = json.loads(r.read())
            assert out["usage"]["completion_tokens"] == 4
        h = router.health()
        alive = {x["address"]: x["alive"] for x in h["replicas"]}
        assert alive[two_replicas[0]] is True
        assert alive["127.0.0.1:1"] is False
    finally:
        server.shutdown()


def test_scaling_harness_drive(two_replicas):
    """tools.scaling_bench.drive: aggregate accounting over the router."""
    from crabml_tpu.tools.scaling_bench import drive

    out = drive(two_replicas, n_requests=4, max_tokens=5)
    assert out["completed"] == 4 and not out["errors"]
    assert out["tokens"] == 4 * 5
    assert out["tok_s"] > 0


def test_http_error_passes_through_and_replica_stays_alive():
    """A 4xx reply from a replica is a RESPONSE, not replica death: the
    router must return it to the client and keep the replica in rotation
    (previously one malformed request marked every replica failed)."""
    import http.server
    import socketserver

    class Bad(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            body = b'{"error": "bad logit_bias"}'
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), Bad) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            router = Router([f"127.0.0.1:{port}"])
            replica, resp = router.forward({"prompt": "x", "logit_bias": "x"})
            assert resp.status == 400
            assert b"bad logit_bias" in resp.read()
            resp.close()
            router.release(replica)
            assert replica.alive  # NOT marked failed
        finally:
            srv.shutdown()


def test_routed_chat_completions(two_replicas):
    """/v1/chat/completions forwards to a replica like completions does."""
    router, server, port = _start_router(two_replicas)
    try:
        body = json.dumps({
            "messages": [{"role": "user", "content": "Lily is a cat"}],
            "max_tokens": 6,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["message"]["role"] == "assistant"
    finally:
        server.shutdown()
        server.server_close()


def test_router_metrics_aggregation(two_replicas):
    """Router /metrics sums each replica's Prometheus series by name and
    adds fleet gauges."""
    router, server, port = _start_router(two_replicas)
    try:
        body = json.dumps({"prompt": "Once upon", "max_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=120).read()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        metrics = {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines() if line and not line.startswith("#")
        }
        assert metrics["crabml_router_replicas_total"] == 2
        assert metrics["crabml_router_replicas_alive"] == 2
        # summed across replicas: 2 slots each
        assert metrics["crabml_slots_total"] == 4
        assert metrics["crabml_requests_submitted_total"] >= 1
        assert "# TYPE crabml_requests_submitted_total counter" in text
        # histogram buckets sum across replicas; no TYPE line per bucket
        assert metrics['crabml_ttft_seconds_bucket{le="+Inf"}'] >= 1
        # prefix-cache observability rides the same aggregation (paged
        # replicas): evictions exported fleet-wide even when zero
        assert "crabml_prefix_evictions_total" in metrics
        # router-level affinity stickiness counters
        assert "crabml_router_affinity_hits_total" in metrics
        assert "crabml_router_affinity_repoints_total" in metrics
        assert "# TYPE crabml_ttft_seconds histogram" in text
        assert '# TYPE crabml_ttft_seconds_bucket' not in text
    finally:
        server.shutdown()
        server.server_close()


def test_prefix_affinity_sticks_and_yields_to_load():
    r = Router(["a:1", "b:1", "c:1"], affinity_slack=2)
    key = Router.prefix_key({"prompt": "You are a helpful assistant. " * 40})
    assert key is not None
    first = r.pick(key)
    r.release(first)
    # same prefix → same replica, even though others are equally idle
    for _ in range(3):
        p = r.pick(key)
        assert p is first
        r.release(p)
    # a different prefix load-balances away from the sticky replica
    other = r.pick(Router.prefix_key({"prompt": "unrelated " * 50}))
    assert other is not first
    # overload the sticky replica beyond the slack → load wins and the
    # affinity re-points to the replica actually used
    for _ in range(4):
        first.outstanding += 1
    moved = r.pick(key)
    assert moved is not first
    for _ in range(4):
        r.release(first)
    # ...and stays re-pointed
    again = r.pick(key)
    assert again is moved
    # chat payloads key on the message head; no prompt → no key
    assert Router.prefix_key(
        {"messages": [{"role": "system", "content": "be brief"}]}) is not None
    assert Router.prefix_key({"max_tokens": 5}) is None
