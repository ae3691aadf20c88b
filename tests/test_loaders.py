"""LoRA / textual-inversion / single-file loader tests (VERDICT r2 #6).

Counterparts of the reference pipeline mixins
(pipeline_prompt_diffusion.py:145 `TextualInversionLoaderMixin,
LoraLoaderMixin, FromSingleFileMixin`). Synthetic-file round-trips prove
a LoRA changes exactly the targeted kernels by the folded-weight math
(scale · α/r · B@A) and that TI embeddings wire through tokenizer +
CLIP table into changed encodings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.test_pipeline_sd15 import (  # noqa: F401
    _perturb_zero_init,
    tiny_pipeline,
)

from prompt_diffusion_tpu.data.tokenizer import HashTokenizer
from prompt_diffusion_tpu.tools.loaders import (
    load_lora_weights,
    load_textual_inversion,
)


def _leaf_paths(tree, prefix=()):
    if not isinstance(tree, dict):
        yield prefix, tree
        return
    for k, v in tree.items():
        yield from _leaf_paths(v, prefix + (k,))


def test_lora_fold_math_and_isolation(tiny_pipeline):  # noqa: F811
    """ΔW lands on exactly the targeted kernels as scale·(α/r)·(B@A)ᵀ;
    every other leaf is untouched; pipeline output changes."""
    pipe, params = tiny_pipeline
    params = _perturb_zero_init(params, scale=0.05)  # live head: output moves
    rng = np.random.default_rng(0)
    r, dim = 4, 32  # tiny unet level-0 attn width = model_channels
    down_q = rng.normal(size=(r, dim)).astype(np.float32)
    up_q = rng.normal(size=(dim, r)).astype(np.float32)
    te_dim = 64
    down_te = rng.normal(size=(r, te_dim)).astype(np.float32)
    up_te = rng.normal(size=(te_dim, r)).astype(np.float32)
    alpha = 2.0
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": down_q,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": up_q,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.alpha": np.float32(alpha),
        "text_encoder.text_model.encoder.layers.0.self_attn.q_proj.lora_A.weight": down_te,
        "text_encoder.text_model.encoder.layers.0.self_attn.q_proj.lora_B.weight": up_te,
    }
    scale = 0.7
    params2 = pipe.load_lora_weights(params, sd, scale=scale)

    # exact fold math on the two targets (flax kernels are torch-Wᵀ)
    k_old = params["unet"]["params"]["input_blocks_1_attn"]["block_0"]["attn1"]["to_q"]["kernel"]
    k_new = params2["unet"]["params"]["input_blocks_1_attn"]["block_0"]["attn1"]["to_q"]["kernel"]
    want = np.asarray(k_old) + scale * (alpha / r) * (up_q @ down_q).T
    np.testing.assert_allclose(np.asarray(k_new), want, rtol=1e-6)

    te_old = params["clip"]["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    te_new = params2["clip"]["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(te_new), np.asarray(te_old) + scale * (up_te @ down_te).T, rtol=1e-6)

    # isolation: every other leaf bit-identical
    changed = 0
    old_leaves = dict(_leaf_paths(params))
    for path, new in _leaf_paths(params2):
        if not np.array_equal(np.asarray(old_leaves[path]), np.asarray(new)):
            changed += 1
    assert changed == 2

    # behavior: the denoise prediction actually moves
    lat = jnp.ones((1, 8, 8, 4)) * 0.1
    t = jnp.zeros((1,), jnp.int32)
    ids = jnp.asarray(rng.integers(0, 100, (1, 77)), jnp.int32)
    ctx_a = pipe.encode_prompt(params, ids)
    ctx_b = pipe.encode_prompt(params2, ids)
    assert not np.allclose(np.asarray(ctx_a), np.asarray(ctx_b))
    out_a = pipe.unet.apply(params["unet"], lat, t, ctx_a)
    out_b = pipe.unet.apply(params2["unet"], lat, t, ctx_b)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_lora_zero_scale_is_identity(tiny_pipeline):  # noqa: F811
    pipe, params = tiny_pipeline
    rng = np.random.default_rng(1)
    sd = {
        "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_v.lora_A.weight":
            rng.normal(size=(2, 64)).astype(np.float32),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_v.lora_B.weight":
            rng.normal(size=(64, 2)).astype(np.float32),
    }
    params2 = pipe.load_lora_weights(params, sd, scale=0.0)
    for (pa, a), (pb, b) in zip(_leaf_paths(params), _leaf_paths(params2)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_unknown_module_raises(tiny_pipeline):  # noqa: F811
    pipe, params = tiny_pipeline
    sd = {
        "unet.not.a.real.module.lora_A.weight": np.zeros((2, 8), np.float32),
        "unet.not.a.real.module.lora_B.weight": np.zeros((8, 2), np.float32),
    }
    with pytest.raises(ValueError, match="did not match"):
        pipe.load_lora_weights(params, sd)


def test_lora_kohya_rejected():
    with pytest.raises(ValueError, match="kohya"):
        load_lora_weights(
            {}, {"lora_unet_down_blocks_0.lora_down.weight": np.zeros((2, 4), np.float32),
                 "lora_unet_down_blocks_0.lora_up.weight": np.zeros((4, 2), np.float32)})


def test_lora_legacy_down_up_format(tiny_pipeline):  # noqa: F811
    """Legacy diffusers `.lora.down/.lora.up` suffixes parse too."""
    pipe, params = tiny_pipeline
    rng = np.random.default_rng(2)
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.lora.down.weight":
            rng.normal(size=(2, 64)).astype(np.float32),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.lora.up.weight":
            rng.normal(size=(32, 2)).astype(np.float32),
    }
    params2 = pipe.load_lora_weights(params, sd, scale=1.0)
    k_old = params["unet"]["params"]["input_blocks_1_attn"]["block_0"]["attn2"]["to_k"]["kernel"]
    k_new = params2["unet"]["params"]["input_blocks_1_attn"]["block_0"]["attn2"]["to_k"]["kernel"]
    assert not np.array_equal(np.asarray(k_old), np.asarray(k_new))


def test_textual_inversion_a1111_format(tiny_pipeline, tmp_path):  # noqa: F811
    """A1111 .pt layout: table grows, tokenizer expands the placeholder to
    n consecutive new ids, encodings change."""
    pipe, params = tiny_pipeline
    tok = HashTokenizer()
    emb = np.random.default_rng(3).normal(size=(2, 64)).astype(np.float32)  # 2-vector TI
    path = str(tmp_path / "style.pt")
    torch.save({"string_to_param": {"*": torch.tensor(emb)}, "name": "<tiny-style>"}, path)

    vocab = params["clip"]["params"]["token_embedding"]["embedding"].shape[0]
    pipe2, params2, token, ids = pipe.load_textual_inversion(params, tok, path)
    assert token == "<tiny-style>"
    assert ids == [vocab, vocab + 1]
    table2 = params2["clip"]["params"]["token_embedding"]["embedding"]
    assert table2.shape[0] == vocab + 2
    np.testing.assert_allclose(np.asarray(table2[vocab:]), emb)
    assert pipe2.text_encoder.config.vocab_size == vocab + 2

    out = tok(["a photo of <tiny-style> here"])
    row = out[0].tolist()
    i = row.index(ids[0])
    assert row[i + 1] == ids[1]

    # encode with the new ids (hash ids for plain words exceed the tiny
    # 100-token test vocab, so build an in-vocab id row around them)
    valid = np.full((1, 77), 3, np.int32)
    valid[0, 1], valid[0, 2] = ids
    ctx = pipe2.encode_prompt(params2, jnp.asarray(valid))
    assert np.isfinite(np.asarray(ctx)).all()
    # the learned rows actually drive the encoding: zeroing them changes it
    import copy

    params3 = {k: copy.deepcopy(v) for k, v in params2.items()}
    tbl = np.array(params3["clip"]["params"]["token_embedding"]["embedding"])
    tbl[ids] = 0.0
    params3["clip"]["params"]["token_embedding"]["embedding"] = tbl
    ctx3 = pipe2.encode_prompt(params3, jnp.asarray(valid))
    assert not np.allclose(np.asarray(ctx), np.asarray(ctx3))


def test_textual_inversion_diffusers_format(tiny_pipeline, tmp_path):  # noqa: F811
    pipe, params = tiny_pipeline
    tok = HashTokenizer()
    emb = np.random.default_rng(4).normal(size=(64,)).astype(np.float32)
    path = str(tmp_path / "tok.bin")
    torch.save({"<cat-toy>": torch.tensor(emb)}, path)
    _, params2, token, ids = pipe.load_textual_inversion(params, tok, path)
    assert token == "<cat-toy>" and len(ids) == 1
    np.testing.assert_allclose(
        np.asarray(params2["clip"]["params"]["token_embedding"]["embedding"][ids[0]]), emb)


def test_from_single_file(tmp_path):
    """Synthetic reference .ckpt → (pipe, params) with the 4 namespaces
    (FromSingleFileMixin counterpart)."""
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15

    sd = {
        "model.diffusion_model.time_embed.0.weight": torch.zeros(1280, 320),
        "model.diffusion_model.time_embed.0.bias": torch.zeros(1280),
        "control_model.time_embed.0.weight": torch.zeros(1280, 320),
        "first_stage_model.encoder.conv_in.weight": torch.zeros(128, 3, 3, 3),
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": torch.zeros(768),
        "cond_stage_model.transformer.text_model.final_layer_norm.bias": torch.zeros(768),
    }
    path = str(tmp_path / "v1.ckpt")
    torch.save({"state_dict": sd}, path)
    pipe, params = PromptDiffusionSD15.from_single_file(path)
    assert isinstance(pipe, PromptDiffusionSD15)
    assert set(params) >= {"unet", "controlnet", "vae", "clip"}
    assert "fc1" in params["unet"]["params"]["time_embed"]
