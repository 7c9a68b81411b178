"""Prompt-lookup speculative decoding (runtime.speculative).

The reference has no speculative path (one token per forward,
llama2.rs:141-172); this is a beyond-parity serving feature. The
contract under test: the emitted stream equals plain greedy decode, and
the position/history bookkeeping survives partial accepts and the
steps-cap rollback.
"""

import numpy as np

from crabml_tpu.runtime.runner import Runner


def test_speculative_matches_greedy(stories260k_path):
    """Byte-identical to the plain greedy stream (same window as the
    golden test — past ~18 tokens this model hits a near-tie argmax that
    any reduction-order change can flip)."""
    plain = Runner(stories260k_path, seq_len=128)
    want = "".join(plain.prefill_and_generate("Lily is a cat", steps=14))

    spec = Runner(stories260k_path, seq_len=128, speculative=4)
    got = "".join(spec.prefill_and_generate("Lily is a cat", steps=14))
    assert got == want
    assert spec.metrics.counts.get("spec_rounds", 0) > 0


def test_speculative_pos_and_history_consistent(stories260k_path):
    """After a speculative run, pos and the consumed-token history must
    match the plain runner's (the steps-cap rollback discards the same
    trailing token), so a following turn starts from identical state."""
    plain = Runner(stories260k_path, seq_len=256)
    out_p = "".join(plain.prefill_and_generate("The dog and the cat", steps=24))

    spec = Runner(stories260k_path, seq_len=256, speculative=6)
    out_s = "".join(spec.prefill_and_generate("The dog and the cat", steps=24))
    assert out_s == out_p
    assert int(spec.pos[0]) == int(plain.pos[0])
    assert spec._consumed == plain._consumed
    # history list mirrors cache occupancy exactly
    assert len(spec._consumed) == int(spec.pos[0])

    # a second turn from the speculative runner equals the plain one's
    nxt_p = "".join(plain.generate(9, steps=6))
    nxt_s = "".join(spec.generate(9, steps=6))
    assert nxt_s == nxt_p


def test_speculative_counts_tokens(stories260k_path):
    """spec_tokens metric counts every emitted token; tokens metric
    matches the yielded count + the discarded rollback token."""
    spec = Runner(stories260k_path, seq_len=128, speculative=4)
    pieces = list(spec.prefill_and_generate("Once upon a time", steps=16))
    # generate() yields the prefill-sampled token first; the loop then
    # emits steps-1 more (or stops at EOS)
    assert 1 <= len(pieces) <= 16
    assert spec.metrics.counts.get("spec_rounds", 0) >= 1
    rounds = spec.metrics.counts["spec_rounds"]
    toks = spec.metrics.counts["spec_tokens"]
    assert toks >= rounds  # every round emits at least one token
    assert np.all(np.asarray(spec.pos) <= 128)
