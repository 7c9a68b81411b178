"""bench.py must keep producing its ONE JSON line — the driver runs it
every round; bitrot here would lose the round's headline measurement."""

import json
import sys


def test_bench_prefill_tiny_cpu(capsys):
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import bench

    argv = sys.argv
    sys.argv = ["bench.py", "--model", "tiny", "--quant", "q8_0",
                "--mode", "prefill", "--backend", "xla", "--prefill", "64"]
    try:
        bench.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["metric"].startswith("prefill_tokens_per_sec")
    assert d["value"] > 0
    assert "vs_baseline" in d and "unit" in d


def test_bench_speculative_tiny_cpu(capsys):
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import bench

    argv = sys.argv
    sys.argv = ["bench.py", "--model", "tiny", "--quant", "q8_0",
                "--mode", "speculative", "--backend", "xla",
                "--gguf", "none", "--prefill", "48", "--draft", "4"]
    try:
        bench.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["metric"].startswith("speculative_decode_tokens_per_sec")
    assert d["value"] > 0
    # every round emits at least the verify pass's own token
    assert d["detail"]["accept_tokens_per_round"] >= 1.0
