"""HF safetensors -> GGUF converter (tools.convert_hf).

Differential gate: build a tiny random HF checkpoint with transformers,
convert it, and the converted GGUF's forward must match the torch
forward logits — this pins the tensor name map, the rope-layout
permutation (HF rotate-half -> ggml interleaved for llama), metadata
keys, and the tokenizer conversion end to end.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _mk_tokenizer_json(path, vocab_size):
    """Minimal valid byte-level BPE tokenizer.json with byte alphabet +
    specials, padded with filler tokens to exactly vocab_size ids."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    tokens = sorted(alphabet)
    vocab = {"<s>": 0, "</s>": 1}
    for t in tokens:
        vocab[t] = len(vocab)
    i = 0
    while len(vocab) < vocab_size:
        vocab[f"<fill{i}>"] = len(vocab)
        i += 1
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(str(path))
    # declare the specials the way HF checkpoints do
    tj = json.loads(open(path).read())
    tj["added_tokens"] = [
        {"id": 0, "content": "<s>", "special": True},
        {"id": 1, "content": "</s>", "special": True},
    ]
    with open(path, "w") as f:
        json.dump(tj, f)


def _convert_and_compare(hf_dir, tmp_path, model, tokens, rtol=2e-4, atol=2e-4):
    import jax.numpy as jnp

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.weights import load_weights
    from crabml_tpu.tools.convert_hf import convert_hf

    out = str(tmp_path / "converted.gguf")
    info = convert_hf(str(hf_dir), out, outtype="f32", verbose=False)
    assert info["bytes"] > 0

    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].float().numpy()

    gf = GGUFFile(out)
    cfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, cfg)
    cache = KVCache.create(cfg, 1, 64)
    logits, _ = forward(w, cache, jnp.asarray([tokens], jnp.int32),
                        jnp.zeros(1, jnp.int32), cfg)
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return gf


def test_convert_llama_matches_torch(tmp_path):
    """llama model_type: exercises the q/k rope permutation (ggml llama
    rope is interleaved; HF is rotate-half — an un-permuted convert
    produces garbage logits, so closeness here pins it)."""
    V = 280  # byte alphabet 256 + 2 specials + filler
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    tokens = [0, 5, 99, 260, 17]
    gf = _convert_and_compare(hf_dir, tmp_path, model, tokens)

    # metadata round-trip essentials
    md = gf.metadata
    assert md.get_str("general.architecture") == "llama"
    assert md.get_int("llama.attention.head_count") == 4
    assert md.get_int("llama.attention.head_count_kv") == 2
    # config.json's declared ids win over the tokenizer.json heuristic
    assert md.get_int("tokenizer.ggml.bos_token_id") == model.config.bos_token_id
    # the tokenizer in the GGUF must actually work
    from crabml_tpu.tokenizer import tokenizer_from_gguf

    tok = tokenizer_from_gguf(md)
    ids = tok.encode("hi there", bos=False)
    # (the facade adds a llama.cpp-style prefix space on encode)
    assert ids and tok.decode_tokens(ids).lstrip() == "hi there"


def test_convert_qwen2_matches_torch(tmp_path):
    """qwen2: neox rope (no permutation) + qkv biases."""
    V = 272
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=100000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    _convert_and_compare(hf_dir, tmp_path, model, [1, 7, 42, 200])


def test_convert_quantized_outtype(tmp_path):
    """--outtype q8_0 writes a loadable quantized GGUF whose logits stay
    close to the f32 torch forward (q8_0 error budget)."""
    import jax.numpy as jnp

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.weights import load_weights
    from crabml_tpu.tools.convert_hf import convert_hf

    V = 272
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.LlamaForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    out = str(tmp_path / "q8.gguf")
    convert_hf(str(hf_dir), out, outtype="q8_0", verbose=False)
    tokens = [3, 14, 159]
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0, -1].float().numpy()
    gf = GGUFFile(out)
    mcfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, mcfg)
    cache = KVCache.create(mcfg, 1, 32)
    logits, _ = forward(w, cache, jnp.asarray([tokens], jnp.int32),
                        jnp.zeros(1, jnp.int32), mcfg)
    got = np.asarray(logits[0, -1])
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.02

def test_convert_mixtral_matches_torch(tmp_path):
    """mixtral: router + per-expert w1/w3/w2 stacked into the 3D
    ffn_*_exps tensors, expert_count metadata, llama rope permutation."""
    V = 272
    cfg = transformers.MixtralConfig(
        vocab_size=V, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    model = transformers.MixtralForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    gf = _convert_and_compare(hf_dir, tmp_path, model, [2, 9, 77, 201, 30],
                              rtol=5e-4, atol=5e-4)
    md = gf.metadata
    assert md.get_int("llama.expert_count") == 4
    assert md.get_int("llama.expert_used_count") == 2

def _mk_spm_model(path, pieces):
    """Hand-serialize a sentencepiece ModelProto (inverse of the
    converter's minimal parser): field 1 repeated SentencePiece."""
    import struct as _struct

    def varint(v):
        out = b""
        while True:
            b, v = v & 0x7F, v >> 7
            out += bytes([b | (0x80 if v else 0)])
            if not v:
                return out

    blob = b""
    for piece, score, typ in pieces:
        p = piece.encode()
        sp = (bytes([0x0A]) + varint(len(p)) + p          # 1: piece
              + bytes([0x15]) + _struct.pack("<f", score)  # 2: score
              + bytes([0x18]) + varint(typ))               # 3: type
        blob += bytes([0x0A]) + varint(len(sp)) + sp
    with open(path, "wb") as f:
        f.write(blob)


def test_convert_spm_tokenizer_and_chat_template(tmp_path):
    """sentencepiece-only checkpoint: tokenizer.model parsed by the
    minimal proto reader into llama-style GGUF metadata; chat_template
    from tokenizer_config.json carried through."""
    V = 272
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    model = transformers.LlamaForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    # llama-style SPM vocab: specials, byte fallbacks, word pieces
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    pieces += [(c, -5.0, 1) for c in sorted(set("▁there hi"))
               if c != " "]
    pieces += [("▁hi", -1.0, 1), ("▁there", -2.0, 1),
               ("hi", -3.0, 1)]
    pieces += [(f"<fill{i}>", -10.0, 1) for i in range(V - len(pieces))]
    _mk_spm_model(hf_dir / "tokenizer.model", pieces)
    with open(hf_dir / "tokenizer_config.json", "w") as f:
        json.dump({"chat_template": "{{ messages }}"}, f)

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.tools.convert_hf import convert_hf

    out = str(tmp_path / "spm.gguf")
    convert_hf(str(hf_dir), out, outtype="f32", verbose=False)
    md = GGUFFile(out).metadata
    assert md.get_str("tokenizer.ggml.model") == "llama"
    assert md.get_str("tokenizer.chat_template") == "{{ messages }}"
    assert md.get_int("tokenizer.ggml.bos_token_id") == model.config.bos_token_id

    from crabml_tpu.tokenizer import tokenizer_from_gguf

    tok = tokenizer_from_gguf(md)
    ids = tok.encode("hi there", bos=False)
    assert ids and tok.decode_tokens(ids).lstrip() == "hi there"


def test_convert_yarn_attn_factor_and_spm_id_zero(tmp_path):
    """Two edge pins: HF rope_scaling.attention_factor must land in
    {arch}.rope.scaling.attn_factor (the loader reads it into yarn
    mscale), and an SPM checkpoint declaring bos/eos id 0 must keep 0
    (falsy-zero must not fall back to the 1/2 defaults)."""
    V = 260
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64, tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32,
                      "attention_factor": 1.23},
    )
    torch.manual_seed(5)
    transformers.LlamaForCausalLM(cfg).eval().save_pretrained(
        str(tmp_path / "hf"), safe_serialization=True)
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    pieces += [("a", -1.0, 1)]
    _mk_spm_model(tmp_path / "hf" / "tokenizer.model", pieces)

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.tools.convert_hf import convert_hf

    out = str(tmp_path / "y.gguf")
    convert_hf(str(tmp_path / "hf"), out, outtype="f32", verbose=False)
    md = GGUFFile(out).metadata
    assert md.get_float("llama.rope.scaling.attn_factor") == pytest.approx(1.23)
    assert md.get_int("tokenizer.ggml.bos_token_id") == 0
    assert md.get_int("tokenizer.ggml.eos_token_id") == 0


def test_convert_phi2_matches_torch(tmp_path):
    """phi model_type: fused qkv emit + LayerNorm biases + lm_head bias +
    partial rotary (rope.dimension_count = 0.4 * head_dim here)."""
    V = 280
    cfg = transformers.PhiConfig(
        vocab_size=V, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, layer_norm_eps=1e-5,
        partial_rotary_factor=0.5, rope_theta=10000.0,
    )
    torch.manual_seed(2)
    model = transformers.PhiForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    tokens = [0, 5, 99, 260, 17]
    gf = _convert_and_compare(hf_dir, tmp_path, model, tokens)
    md = gf.metadata
    assert md.get_str("general.architecture") == "phi2"
    assert md.get_int("phi2.rope.dimension_count") == 8  # 0.5 * 16
    assert "output.bias" in gf  # lm_head bias carried through


def test_convert_phi3_matches_torch(tmp_path):
    """phi3 model_type: HF's pre-fused qkv_proj/gate_up_proj map straight
    onto the attn_qkv / ffn_up tensors the phi3 schema slices."""
    V = 280
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(3)
    model = transformers.Phi3ForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    tokens = [0, 7, 42, 270, 3]
    gf = _convert_and_compare(hf_dir, tmp_path, model, tokens)
    assert gf.metadata.get_str("general.architecture") == "phi3"


def test_convert_gemma2_matches_torch(tmp_path):
    """gemma2: softcaps, alternating sliding window, post-norms,
    query_pre_attn_scalar, tied embeddings with embedding scaling."""
    V = 272
    cfg = transformers.Gemma2Config(
        vocab_size=V, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(10)
    model = transformers.Gemma2ForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    gf = _convert_and_compare(hf_dir, tmp_path, model,
                              [0, 5, 99, 260, 17, 3, 42, 7, 201, 111],
                              rtol=5e-4, atol=5e-4)
    md = gf.metadata
    assert md.get_str("general.architecture") == "gemma2"
    assert md.get_int("gemma2.attention.sliding_window") == 8


def test_convert_qwen3_matches_torch(tmp_path):
    """qwen3: per-head q/k RMS norms before rope + explicit head_dim."""
    V = 272
    cfg = transformers.Qwen3Config(
        vocab_size=V, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=100000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    model = transformers.Qwen3ForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    _mk_tokenizer_json(hf_dir / "tokenizer.json", V)

    gf = _convert_and_compare(hf_dir, tmp_path, model, [1, 7, 42, 200, 9])
    assert gf.metadata.get_str("general.architecture") == "qwen3"
