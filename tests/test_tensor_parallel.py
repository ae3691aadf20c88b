"""Tensor-parallel MMDiT correctness on the 8-device virtual mesh.

TP is a capability superset (the reference ships NCCL DDP only,
SURVEY §2.10): head/FF-sharded kernels via GSPMD annotations, zero model
changes. These tests require the TP-sharded forward to equal the
single-device forward to fp32-reduction tolerance, on ('data','tensor')
meshes of 1x8 and 2x4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_sd3 import CCFG, POL, TCFG  # noqa: F401

from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet
from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
from prompt_diffusion_tpu.parallel.tensor_parallel import (
    TP_AXIS,
    apply_tp_sharding,
    make_tp_mesh,
    tp_shardings,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


@pytest.fixture(scope="module")
def tr_pair():
    # 4 heads x 16 head_dim → head axis divides 2- and 4-way tensor groups
    tr = SD3Transformer(config=TCFG, policy=POL)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 10, 64))
    pooled = jnp.zeros((2, 64))
    params = jax.jit(tr.init)(rng, lat, t, ctx, pooled)
    g = np.random.default_rng(0)
    inputs = (
        jnp.asarray(g.normal(size=(2, 8, 8, 4)), jnp.float32),
        jnp.asarray([250.0, 875.0], jnp.float32),
        jnp.asarray(g.normal(size=(2, 10, 64)), jnp.float32),
        jnp.asarray(g.normal(size=(2, 64)), jnp.float32),
    )
    ref = np.asarray(jax.jit(tr.apply)(params, *inputs))
    return tr, params, inputs, ref


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_mmdit_tp_forward_equivalence(tr_pair, shape):
    tr, params, inputs, ref = tr_pair
    mesh = make_tp_mesh(num_data=shape[0], num_tensor=shape[1])
    sharded = apply_tp_sharding(params, mesh)
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(x, rep) for x in inputs]
    out = jax.jit(tr.apply)(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-5)


def test_tp_sharding_rules_hit_the_kernels(tr_pair):
    """The head/FF kernels actually get a tensor-axis spec (guards against
    silent name drift making the whole tree replicated)."""
    tr, params, _, _ = tr_pair
    mesh = make_tp_mesh(num_data=2, num_tensor=4)
    sh = tp_shardings(params, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(sh)
    tp_leaves = [
        "/".join(getattr(p, "key", str(p)) for p in path)
        for path, s in leaves
        if TP_AXIS in str(s.spec)
    ]
    assert any("to_q" in p for p in tp_leaves)
    assert any("ff_in" in p for p in tp_leaves)
    assert any("to_out" in p for p in tp_leaves)
    # per block: 6 qkv + 2 out + 4 ff kernels (+ sharded col biases)
    assert len(tp_leaves) >= 12


def test_sd3_controlnet_tp_equivalence():
    cn = SD3ControlNet(config=CCFG, policy=POL)
    rng = jax.random.PRNGKey(1)
    lat = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 10, 64))
    pooled = jnp.zeros((2, 64))
    params = jax.jit(cn.init)(rng, lat, t, lat, lat, ctx, pooled)
    g = np.random.default_rng(1)
    args = (
        jnp.asarray(g.normal(size=(2, 8, 8, 4)), jnp.float32),
        jnp.asarray([250.0, 875.0], jnp.float32),
        jnp.asarray(g.normal(size=(2, 8, 8, 4)), jnp.float32),
        jnp.asarray(g.normal(size=(2, 8, 8, 4)), jnp.float32),
        jnp.asarray(g.normal(size=(2, 10, 64)), jnp.float32),
        jnp.asarray(g.normal(size=(2, 64)), jnp.float32),
    )
    # non-vacuous taps: perturb the zero-init tap kernels
    i = [0]

    def live(x):
        if x.ndim >= 2 and not np.any(np.asarray(x)):
            i[0] += 1
            return x + 0.05 * jax.random.normal(jax.random.PRNGKey(i[0]), x.shape, x.dtype)
        return x

    params = jax.tree_util.tree_map(live, params)
    ref = [np.asarray(x) for x in jax.jit(cn.apply)(params, *args)]
    assert max(np.abs(r).max() for r in ref) > 0

    mesh = make_tp_mesh(num_data=2, num_tensor=4)
    sharded = apply_tp_sharding(params, mesh)
    rep = NamedSharding(mesh, P())
    args_r = [jax.device_put(x, rep) for x in args]
    out = jax.jit(cn.apply)(sharded, *args_r)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=1e-5)
