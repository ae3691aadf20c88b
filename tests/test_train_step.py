"""SD1.5 train-step semantics on the tiny pipeline.

Documents a subtle property: at PURE random init the UNet's
zero-initialized output conv blocks all gradient flow upstream
(pred ≡ 0 ⇒ ∂loss/∂controlnet = 0 exactly). Real training starts from a
pretrained checkpoint (tool_add_control / torch_import), where the head
is live — then gradients must flow and params must move.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_pipeline_sd15 import (  # noqa: F401
    _perturb_zero_init,
    tiny_pipeline,
)

from prompt_diffusion_tpu.training.sd15 import (
    SD15TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _batch(b=2, res=64):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, res, res, 3)), jnp.float32),
        "query": jnp.asarray(rng.uniform(-1, 1, (b, res, res, 3)), jnp.float32),
        "example_pair": jnp.asarray(rng.uniform(-1, 1, (b, res, res, 6)), jnp.float32),
        "token_ids": jnp.asarray(rng.integers(0, 100, (b, 77)), jnp.int32),
        "null_ids": jnp.zeros((1, 77), jnp.int32),
    }


def _setup(pipe, params):
    cfg = SD15TrainConfig(accum_steps=1, use_ema=False)
    trainable = {"controlnet": params["controlnet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    return cfg, state, frozen, jax.jit(make_train_step(pipe, cfg, tx))


def test_grads_flow_with_live_head(tiny_pipeline):  # noqa: F811
    pipe, params = tiny_pipeline
    params = _perturb_zero_init(params, scale=0.05)
    _, state, frozen, step = _setup(pipe, params)
    before = jax.tree_util.tree_leaves(state.trainable)[0]
    state, metrics = step(state, frozen, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0.0, "live head must backprop into controlnet"
    after = jax.tree_util.tree_leaves(state.trainable)[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after)), "params must move"


def test_zero_init_head_blocks_gradients(tiny_pipeline):  # noqa: F811
    """Exact-zero grads at pure random init — the zero-init out_conv is a
    hard gradient wall. (Catches accidental init changes that would make
    fresh models train 'from nothing' differently from the reference.)"""
    pipe, params = tiny_pipeline
    _, state, frozen, step = _setup(pipe, params)
    state, metrics = step(state, frozen, _batch(), jax.random.PRNGKey(1))
    assert float(metrics["grad_norm"]) == 0.0
    assert 0.5 < float(metrics["loss"]) < 2.0  # mse(0, noise) ≈ 1


def test_sd_unlocked_freezes_unet_encoder_exactly(tiny_pipeline):  # noqa: F811
    """sd_locked=False trains ONLY the UNet decoder + head: the encoder/
    middle params must receive an exact-zero update (the reference simply
    omits them from the optimizer, cldm.py:457-464 — optax.masked alone
    would pass the RAW gradient through for them)."""
    pipe, params = tiny_pipeline
    params = _perturb_zero_init(params, scale=0.05)
    cfg = SD15TrainConfig(accum_steps=1, use_ema=False, sd_locked=False)
    trainable = {"controlnet": params["controlnet"], "unet": params["unet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    # frozen keeps the unet entry (train_sd15.py convention — loss_fn's
    # trainable.get("unet", frozen["unet"]) evaluates the fallback eagerly)
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    step = jax.jit(make_train_step(pipe, cfg, tx))
    before = state.trainable["unet"]
    state, metrics = step(state, frozen, _batch(), jax.random.PRNGKey(1))
    assert float(metrics["grad_norm"]) > 0.0
    after = state.trainable["unet"]
    moved_frozen, moved_dec = [], []
    for path, b in jax.tree_util.tree_flatten_with_path(before)[0]:
        leaf_after = after
        for p in path:
            leaf_after = leaf_after[getattr(p, "key", p)]
        # paths look like (params, <block>, ...) — classify by the block
        # level, same as _unet_decoder_mask
        top = getattr(path[1], "key", str(path[1])) if len(path) > 1 else ""
        changed = not np.array_equal(np.asarray(b), np.asarray(leaf_after))
        if top.startswith("output_blocks_") or top in ("out_norm", "out_conv"):
            moved_dec.append(changed)
        else:
            assert not changed, f"frozen UNet leaf moved: {path}"
    assert any(moved_dec), "decoder params must train when sd_locked=False"


def test_ema_advances_only_on_accum_boundary(tiny_pipeline):  # noqa: F811
    """With accum_steps=k the EMA must update once per OPTIMIZER step
    (LitEma hooks on_train_batch_end after accumulation), not every
    micro-step — its count may advance at most once per k micro-steps."""
    pipe, params = tiny_pipeline
    params = _perturb_zero_init(params, scale=0.05)
    cfg = SD15TrainConfig(accum_steps=2, use_ema=True)
    trainable = {"controlnet": params["controlnet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    step = jax.jit(make_train_step(pipe, cfg, tx))
    batch = _batch()
    for i in range(4):
        state, _ = step(state, frozen, batch, jax.random.PRNGKey(1))
    # 4 micro-steps at k=2 → exactly 2 optimizer steps → EMA count 2
    assert int(state.ema.count) == 2


def test_lambda_linear_f_min_decay():
    """Post-warmup: f = f_min + (f_max-f_min)·(L-n)/L — a non-trivial
    f_min must decay (ldm/lr_scheduler.py:92-97), not plateau at f_max."""
    from prompt_diffusion_tpu.training.lr_schedules import lambda_linear

    s = lambda_linear(1.0, warm_up_steps=10, f_start=0.0, f_max=1.0,
                      f_min=0.1, cycle_length=1000)
    assert float(s(10)) == pytest.approx(0.1 + 0.9 * (1000 - 10) / 1000)
    assert float(s(1000)) == pytest.approx(0.1)
    assert float(s(505)) < float(s(10))  # actually decays
    # PD config (f_min == f_max == 1): constant after warmup
    s2 = lambda_linear(2.0, warm_up_steps=10, f_start=0.0)
    assert float(s2(10_000)) == pytest.approx(2.0)
