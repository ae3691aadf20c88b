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
