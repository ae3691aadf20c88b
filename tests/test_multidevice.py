"""Multi-device CORRECTNESS tier (8-device virtual CPU mesh, see conftest).

VERDICT r2 #1: the multichip dryrun only proved "compiles and runs". These
tests prove the sharded programs compute the SAME answer as one device:

  * SD1.5 train step: 1-device vs 4x2 vs 8x1 meshes — loss, grad-norm and
    the actual parameter UPDATE tree must agree to fp32-reduction
    tolerance (a transposed mesh axis or wrong PartitionSpec changes the
    update, not just the compile).
  * SD3 train step: 1-device vs 4x2.
  * sharded generate: the inference pipeline under `batch_sharding` must
    reproduce the single-device images bit-for-nearly.
  * sharded orbax checkpoint: save from a mesh, restore into mesh
    shardings, training continues from the same numbers.
  * FID stats: `psum_stats` under shard_map == single-process streaming
    stats (the reference's NCCL all_reduce analogue, eval/fid.py:53-77).

Reference behaviors matched: train.py:260 (DDP trainers), eval/fid.py:73-74
(all-reduced moments), eval/distributed.py:13-27 (bootstrap).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_pipeline_sd15 import (  # noqa: F401
    _perturb_zero_init,
    tiny_pipeline,
)
from tests.test_sd3 import sd3  # noqa: F401

from prompt_diffusion_tpu.parallel.mesh import (
    apply_sharding,
    batch_sharding,
    make_mesh,
    replicate,
    shard_params,
)
from prompt_diffusion_tpu.training.sd15 import (
    SD15TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def _sd15_batch(b=8, res=64):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, res, res, 3)), jnp.float32),
        "query": jnp.asarray(rng.uniform(-1, 1, (b, res, res, 3)), jnp.float32),
        "example_pair": jnp.asarray(rng.uniform(-1, 1, (b, res, res, 6)), jnp.float32),
        "token_ids": jnp.asarray(rng.integers(0, 100, (b, 77)), jnp.int32),
        "null_ids": jnp.zeros((1, 77), jnp.int32),
    }


def _shard_sd15_state(state, frozen, batch, mesh):
    """Real deployment shardings: trainable/opt/frozen fsdp-sharded,
    batch over (data, fsdp)."""
    state_sh = jax.tree_util.tree_map(lambda x: replicate(mesh), state)
    state_sh = state_sh._replace(
        trainable=shard_params(state.trainable, mesh, min_size=1024),
        opt_state=shard_params(state.opt_state, mesh, min_size=1024),
    )
    state = apply_sharding(state, state_sh)
    frozen = apply_sharding(frozen, shard_params(frozen, mesh, min_size=1024))
    bs = batch_sharding(mesh)
    b = batch["image"].shape[0]
    batch = {
        k: jax.device_put(v, bs if v.shape[0] == b else replicate(mesh))
        for k, v in batch.items()
    }
    return state, frozen, batch


def _run_sd15_step(pipe, params, mesh):
    cfg = SD15TrainConfig(accum_steps=1, use_ema=False)
    trainable = {"controlnet": params["controlnet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    batch = _sd15_batch()
    state, frozen, batch = _shard_sd15_state(state, frozen, batch, mesh)
    step = jax.jit(make_train_step(pipe, cfg, tx, mesh=mesh))
    new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    delta = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
        new_state.trainable,
        state.trainable,
    )
    return float(metrics["loss"]), float(metrics["grad_norm"]), delta


def _assert_tree_close(a, b, rtol, atol):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(xa, xb, rtol=rtol, atol=atol)


def test_sd15_train_step_mesh_equivalence(tiny_pipeline):  # noqa: F811
    """1-device vs 4x2 vs 8x1: identical inputs → identical loss,
    grad-norm, and parameter UPDATE (fp32-reduction tolerance)."""
    pipe, params = tiny_pipeline
    params = _perturb_zero_init(params, scale=0.05)

    mesh1 = make_mesh(num_data=1, num_fsdp=1, devices=jax.devices()[:1])
    mesh42 = make_mesh(num_data=4, num_fsdp=2)
    mesh81 = make_mesh(num_data=8, num_fsdp=1)

    loss1, gn1, d1 = _run_sd15_step(pipe, params, mesh1)
    loss42, gn42, d42 = _run_sd15_step(pipe, params, mesh42)
    loss81, gn81, d81 = _run_sd15_step(pipe, params, mesh81)

    assert gn1 > 0  # perturbed head → live gradients (else the test is vacuous)
    np.testing.assert_allclose(loss42, loss1, rtol=2e-5)
    np.testing.assert_allclose(loss81, loss1, rtol=2e-5)
    np.testing.assert_allclose(gn42, gn1, rtol=1e-4)
    np.testing.assert_allclose(gn81, gn1, rtol=1e-4)
    # Adam normalizes by grad magnitude, so update direction is where a
    # wrong psum/missing mean shows up (a 8x-scaled grad gives ~identical
    # adam updates at step 0 — loss/gn equality above catches the scale).
    _assert_tree_close(d42, d1, rtol=5e-3, atol=1e-10)
    _assert_tree_close(d81, d1, rtol=5e-3, atol=1e-10)
    mx = max(float(np.abs(x).max()) for x in jax.tree_util.tree_leaves(d1))
    assert mx > 0, "update must be non-trivial"


def test_sd15_generate_sharded_equivalence(tiny_pipeline):  # noqa: F811
    """Inference under batch_sharding == single-device images."""
    pipe, params = tiny_pipeline
    mesh = make_mesh(num_data=4, num_fsdp=2)
    gen = pipe.jit_generate()

    b = 8
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 100, (b, 77)), jnp.int32)
    neg = jnp.zeros_like(ids)
    pair = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 6)), jnp.float32)
    query = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, 8, 8, 4)), jnp.float32)

    ref = gen(params, jax.random.PRNGKey(0), ids, neg, pair, query,
              num_steps=2, guidance_scale=9.0, init_noise=noise)

    bs = batch_sharding(mesh)
    rep = replicate(mesh)
    params_sh = apply_sharding(params, shard_params(params, mesh, min_size=1024))
    args_sh = [jax.device_put(x, bs) for x in (ids, neg, pair, query, noise)]
    out = gen(params_sh, jax.device_put(jax.random.PRNGKey(0), rep),
              args_sh[0], args_sh[1], args_sh[2], args_sh[3],
              num_steps=2, guidance_scale=9.0, init_noise=args_sh[4])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sharded_checkpoint_roundtrip(tiny_pipeline, tmp_path):  # noqa: F811
    """orbax save from a 4x2 mesh → restore into mesh shardings →
    training continues with identical numbers (multi-host-safe resume,
    reference train.py:224-235 rotation semantics tested elsewhere)."""
    import orbax.checkpoint as ocp

    from prompt_diffusion_tpu.training.checkpoint import (
        make_manager,
        restore_state,
        save_state,
        wait_for_saves,
    )

    pipe, params = tiny_pipeline
    params = _perturb_zero_init(params, scale=0.05)
    mesh = make_mesh(num_data=4, num_fsdp=2)

    cfg = SD15TrainConfig(accum_steps=1, use_ema=False)
    trainable = {"controlnet": params["controlnet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    batch = _sd15_batch()
    state, frozen, batch = _shard_sd15_state(state, frozen, batch, mesh)
    step = jax.jit(make_train_step(pipe, cfg, tx, mesh=mesh))

    state1, m1 = step(state, frozen, batch, jax.random.PRNGKey(1))
    mgr = make_manager(str(tmp_path / "ckpt"), save_every=1)
    save_state(mgr, 1, state1, force=True)
    wait_for_saves(mgr)

    # restore into the SHARDED template (fresh state re-put on the mesh)
    template, _, _ = _shard_sd15_state(
        init_train_state(cfg, params, tx), frozen, batch, mesh)
    restored, at = restore_state(mgr, template)
    assert at == 1
    _assert_tree_close(
        jax.tree_util.tree_map(np.asarray, restored.trainable),
        jax.tree_util.tree_map(np.asarray, state1.trainable), rtol=0, atol=0)
    for leaf in jax.tree_util.tree_leaves(
            restored, is_leaf=lambda x: isinstance(x, jax.Array)):
        if isinstance(leaf, jax.Array) and leaf.size > 4096:
            assert len(leaf.sharding.device_set) > 1, "restore must keep mesh sharding"

    # the restored state continues EXACTLY like the unsaved one
    s_a, m_a = step(state1, frozen, batch, jax.random.PRNGKey(2))
    s_b, m_b = step(restored, frozen, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]), rtol=1e-6)
    assert int(s_b.step) == 2
    mgr.close()


def test_fid_psum_matches_single_process():
    """shard_map + psum_stats over the full 4x2 mesh == streaming
    single-process stats; Fréchet distance agrees."""
    from prompt_diffusion_tpu.evaluation.fid import (
        FeatureStats,
        compute_stats_from_iterator,
        compute_stats_sharded,
        frechet_distance,
    )

    mesh = make_mesh(num_data=4, num_fsdp=2)
    dim = 16
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, dim)).astype(np.float32))

    def feature_fn(x01):  # (B,H,W,3) → (B,dim), jittable
        return jnp.mean(x01, axis=(1, 2)) @ w

    imgs = rng.uniform(0, 1, (64, 8, 8, 3)).astype(np.float32)

    single = compute_stats_from_iterator(
        feature_fn, iter([imgs[:40], imgs[40:]]), dim)
    sharded = compute_stats_sharded(feature_fn, imgs, mesh)

    assert sharded.count == single.count == 64
    np.testing.assert_allclose(sharded.raw_sum, single.raw_sum, rtol=1e-5)
    np.testing.assert_allclose(sharded.raw_outer, single.raw_outer, rtol=1e-5)

    other = FeatureStats.zero(dim).update(
        rng.normal(size=(64, dim)).astype(np.float32))
    f1 = frechet_distance(*single.finalize(), *other.finalize())
    f2 = frechet_distance(*sharded.finalize(), *other.finalize())
    np.testing.assert_allclose(f2, f1, rtol=1e-4)


def test_fid_streaming_sharded_partial_batches():
    """The streaming sharded path handles non-device-multiple tails
    without corrupting the moments (padding-free)."""
    from prompt_diffusion_tpu.evaluation.fid import (
        compute_stats_from_iterator,
        compute_stats_from_iterator_sharded,
    )

    mesh = make_mesh(num_data=4, num_fsdp=2)
    dim = 8
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, dim)).astype(np.float32))
    feature_fn = lambda x01: jnp.mean(x01, axis=(1, 2)) @ w
    batches = [rng.uniform(0, 1, (n, 8, 8, 3)).astype(np.float32) for n in (19, 16, 5)]

    single = compute_stats_from_iterator(feature_fn, iter(batches), dim)
    sharded = compute_stats_from_iterator_sharded(feature_fn, iter(batches), dim, mesh)
    assert sharded.count == single.count == 40
    np.testing.assert_allclose(sharded.raw_sum, single.raw_sum, rtol=1e-5)
    np.testing.assert_allclose(sharded.raw_outer, single.raw_outer, rtol=1e-5)


def _run_sd3_step(pipe, params, mesh):
    from prompt_diffusion_tpu.training.sd3 import (
        SD3TrainConfig,
        init_sd3_train_state,
        make_sd3_optimizer,
        make_sd3_train_step,
    )

    cfg = SD3TrainConfig(use_ema=False)
    tx = make_sd3_optimizer(cfg)
    state = init_sd3_train_state(cfg, params, tx)
    frozen = {k: params[k] for k in ("transformer", "vae", "clip_l", "clip_g")}

    b = 8
    rng = np.random.default_rng(2)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32),
        "control": jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32),
        "support_cond": jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32),
        "support_image": jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32),
        "context": jnp.asarray(rng.normal(size=(b, 10, 64)), jnp.float32),
        "pooled": jnp.asarray(rng.normal(size=(b, 64)), jnp.float32),
    }

    state_sh = jax.tree_util.tree_map(lambda x: replicate(mesh), state)
    state_sh = state_sh._replace(
        trainable=shard_params(state.trainable, mesh, min_size=1024),
        opt_state=shard_params(state.opt_state, mesh, min_size=1024),
    )
    state = apply_sharding(state, state_sh)
    frozen = apply_sharding(frozen, shard_params(frozen, mesh, min_size=1024))
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch.items()}

    step = jax.jit(make_sd3_train_step(pipe, cfg, tx, mesh=mesh))
    new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    delta = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
        new_state.trainable, state.trainable)
    return float(metrics["loss"]), float(metrics["grad_norm"]), delta


def test_sd3_train_step_mesh_equivalence(sd3):  # noqa: F811
    pipe, params = sd3
    mesh1 = make_mesh(num_data=1, num_fsdp=1, devices=jax.devices()[:1])
    mesh42 = make_mesh(num_data=4, num_fsdp=2)
    loss1, gn1, d1 = _run_sd3_step(pipe, params, mesh1)
    loss42, gn42, d42 = _run_sd3_step(pipe, params, mesh42)
    assert gn1 > 0
    np.testing.assert_allclose(loss42, loss1, rtol=2e-5)
    np.testing.assert_allclose(gn42, gn1, rtol=1e-4)
    _assert_tree_close(d42, d1, rtol=5e-3, atol=1e-10)
