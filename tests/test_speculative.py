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


def test_draft_model_speculative_matches_greedy(stories260k_path):
    """Two-model speculative decoding with the SAME model as its own
    draft: acceptance is ~total, and the emitted stream must still be
    byte-identical to plain greedy decode."""
    plain = Runner(stories260k_path, seq_len=128)
    want = "".join(plain.prefill_and_generate("Lily is a cat", steps=14))

    spec = Runner(stories260k_path, seq_len=128,
                  draft_model=stories260k_path)
    assert spec.speculative == 4  # draft_model implies a default length
    got = "".join(spec.prefill_and_generate("Lily is a cat", steps=14))
    assert got == want
    assert spec.metrics.counts.get("spec_rounds", 0) > 0
    # self-draft: nearly every round should accept the full draft
    rounds = spec.metrics.counts["spec_rounds"]
    toks = spec.metrics.counts["spec_tokens"]
    assert toks > rounds  # acceptance strictly above 1 token/round


def test_draft_model_disagreeing_draft_still_exact(stories260k_path, tmp_path):
    """A WRONG draft model (random weights, same vocab) must not change
    output: every rejected draft costs speed only (bonus token is the
    target's own argmax)."""
    import os

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.synthetic import tiny_config, write_synthetic_gguf

    dcfg = tiny_config(
        embedding_dim=64, hidden_dim=128, n_layers=1, n_heads=4,
        n_kv_heads=2, vocab_size=512, seq_len=256,
    )
    dpath = os.path.join(str(tmp_path), "draft.gguf")
    write_synthetic_gguf(dpath, dcfg, GGMLType.F32, seed=7)

    plain = Runner(stories260k_path, seq_len=128)
    want = "".join(plain.prefill_and_generate("Lily is a cat", steps=14))

    spec = Runner(stories260k_path, seq_len=128, draft_model=dpath,
                  speculative=3)
    got = "".join(spec.prefill_and_generate("Lily is a cat", steps=14))
    assert got == want


def test_draft_model_multi_turn_state(stories260k_path):
    """Across turns, the draft runner's cache/pos must track the target
    so turn 2 still speculates correctly (and output stays exact)."""
    plain = Runner(stories260k_path, seq_len=256)
    p1 = "".join(plain.prefill_and_generate("The dog and the cat", steps=12))
    p2 = "".join(plain.prefill_and_generate(" went home", steps=12))

    spec = Runner(stories260k_path, seq_len=256,
                  draft_model=stories260k_path, speculative=4)
    s1 = "".join(spec.prefill_and_generate("The dog and the cat", steps=12))
    s2 = "".join(spec.prefill_and_generate(" went home", steps=12))
    assert (s1, s2) == (p1, p2)
    assert int(spec._draft.pos[0]) <= int(spec.pos[0])
