"""Generate COMMITTED per-family fixtures + HF logit goldens.

VERDICT r3 #6: gemma2/qwen3/phi3/mixtral correctness previously rested on
the self-written numpy oracle (tests/ref_forward.py) — if the oracle and
the engine encoded the same misunderstanding, nothing would catch it.
This tool builds a tiny SEEDED checkpoint per family with transformers'
own reference implementation, records ITS logits as the golden, and
converts the checkpoint to GGUF via tools.convert_hf. Both artifacts are
committed (tests/fixtures/), so every future test run re-checks the
engine against HuggingFace's numerics without needing torch at runtime.

Usage:  python -m crabml_tpu.tools.make_family_fixtures [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

# one fixed prompt per family (ids < the 272-token vocab)
TOKENS = [0, 5, 99, 260, 17, 3, 42, 7, 201, 111, 9, 30, 77, 2, 150, 64]
V = 272  # byte alphabet 256 + 2 specials + filler


def _mk_tokenizer_json(path, vocab_size):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {"<s>": 0, "</s>": 1}
    for t in sorted(alphabet):
        vocab[t] = len(vocab)
    i = 0
    while len(vocab) < vocab_size:
        vocab[f"<fill{i}>"] = len(vocab)
        i += 1
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(str(path))
    tj = json.loads(open(path).read())
    tj["added_tokens"] = [
        {"id": 0, "content": "<s>", "special": True},
        {"id": 1, "content": "</s>", "special": True},
    ]
    with open(path, "w") as f:
        json.dump(tj, f)


def _families(transformers):
    """family -> (seed, config, model_class). Configs mirror each arch's
    distinguishing features at toy scale (2 layers, dim 64)."""
    common = dict(vocab_size=V, hidden_size=64, intermediate_size=96,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, max_position_embeddings=128,
                  tie_word_embeddings=False)
    return {
        "gemma2": (10, transformers.Gemma2Config(
            # softcaps + alternating sliding window + post-norms +
            # query_pre_attn_scalar — every gemma2 deviation at once
            head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            rope_theta=10000.0, **{**common, "tie_word_embeddings": True},
        ), "Gemma2ForCausalLM"),
        "qwen3": (11, transformers.Qwen3Config(
            head_dim=16, rope_theta=100000.0, rms_norm_eps=1e-6, **common,
        ), "Qwen3ForCausalLM"),
        "phi3": (12, transformers.Phi3Config(
            rms_norm_eps=1e-5, rope_theta=10000.0, pad_token_id=0,
            bos_token_id=0, eos_token_id=1, **common,
        ), "Phi3ForCausalLM"),
        "mixtral": (13, transformers.MixtralConfig(
            num_local_experts=4, num_experts_per_tok=2, **common,
        ), "MixtralForCausalLM"),
    }


def main(outdir: str | None = None):
    import torch
    import transformers

    from .convert_hf import convert_hf

    outdir = outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests", "fixtures")
    os.makedirs(outdir, exist_ok=True)
    for family, (seed, cfg, cls_name) in _families(transformers).items():
        torch.manual_seed(seed)
        model = getattr(transformers, cls_name)(cfg).eval()
        with tempfile.TemporaryDirectory() as hf_dir:
            model.save_pretrained(hf_dir, safe_serialization=True)
            _mk_tokenizer_json(os.path.join(hf_dir, "tokenizer.json"), V)
            gguf_path = os.path.join(outdir, f"{family}-tiny-f32.gguf")
            convert_hf(hf_dir, gguf_path, outtype="f32", verbose=False)
        with torch.no_grad():
            logits = model(torch.tensor([TOKENS])).logits[0].float().numpy()
        np.savez(os.path.join(outdir, f"{family}-tiny-golden.npz"),
                 tokens=np.asarray(TOKENS, np.int32),
                 logits=logits.astype(np.float32),
                 transformers_version=np.array(transformers.__version__))
        print(f"{family}: {gguf_path} "
              f"({os.path.getsize(gguf_path)} bytes), golden "
              f"logits {logits.shape}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
