"""serving_bench argument hygiene (ADVICE r3 / VERDICT r4 #9): bad inputs
fail fast at argparse time, BEFORE the multi-GB weight load."""
import pytest

from crabml_tpu.tools.serving_bench import main


def test_unknown_engine_kind_errors():
    with pytest.raises(SystemExit):
        main(["--engines", "dense,warp-drive", "--gguf", "none"])


def test_fused_suffix_only_on_spec_kinds():
    # 'paged-fused' is not a thing: the -fused/-single suffixes force the
    # speculative scan mode per arm, so they only attach to spec kinds
    with pytest.raises(SystemExit):
        main(["--engines", "paged-fused", "--gguf", "none"])


def test_spec_suffix_kinds_pass_validation(capsys):
    # same-process 3-arm A/B spelling must clear kind validation (the run
    # is then stopped by the seq_len headroom check, BEFORE a weight load)
    with pytest.raises(SystemExit):
        main(["--engines", "paged,spec-paged-fused,spec-paged-single",
              "--speculative", "15", "--prompt", "880", "--max-tokens",
              "128", "--seq-len", "1024", "--gguf", "none"])
    err = capsys.readouterr().err
    assert "unknown engine" not in err
    assert "seq_len" in err


def test_seq_len_headroom_plain_tick():
    # 900 + 120 + tick(8) >= 1024: would clamp the fused tick at the edge
    with pytest.raises(SystemExit):
        main(["--engines", "dense", "--prompt", "900", "--max-tokens", "120",
              "--seq-len", "1024", "--gguf", "none"])


def test_seq_len_headroom_counts_speculative():
    # tick fits (8), but a spec engine needs speculative+1 = 16 headroom:
    # 880 + 128 + 16 >= 1024 must be rejected, not silently diluted
    with pytest.raises(SystemExit):
        main(["--engines", "spec", "--speculative", "15", "--prompt", "880",
              "--max-tokens", "128", "--seq-len", "1024", "--gguf", "none"])
