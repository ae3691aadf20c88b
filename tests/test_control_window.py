"""control_guidance_start/end — per-step ControlNet windowing.

The reference pipelines build a python `controlnet_keep` list and multiply
it into conditioning_scale each denoise step
(pipeline_prompt_diffusion.py:1195-1235,
promptdiffusioncontrolnetpipeline_sd3.py:1156-1162,1202-1208). Here the
keep factor is computed inside the jitted loop; these tests check the
factor against a restatement of the reference's exact loop, the
sampling-order index mapping, and the end-to-end pipeline semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.pipelines.control_window import (
    control_keep, is_default_window, step_index_from_timestep, validate_window)
from tests.test_pipeline_sd15 import (  # noqa: F401 (fixture re-export)
    _perturb_zero_init, tiny_pipeline)
from tests.test_sd3 import sd3  # noqa: F401 (fixture re-export)


def _reference_controlnet_keep(num_steps, start, end):
    """Verbatim restatement of the reference loop
    (pipeline_prompt_diffusion.py:1196-1201, single controlnet)."""
    keeps = []
    for i in range(num_steps):
        keeps.append(
            1.0 - float(i / num_steps < start or (i + 1) / num_steps > end))
    return keeps


def test_keep_matches_reference_restatement():
    for n in (3, 7, 28, 50, 51):
        for start in (0.0, 0.1, 0.25, 0.5, 1.0 / n):
            for end in (1.0, 0.75, 0.5 + 1e-9, (n - 1) / n):
                if start >= end:
                    continue
                ref = _reference_controlnet_keep(n, start, end)
                got = [float(control_keep(i, n, start, end)) for i in range(n)]
                assert got == ref, (n, start, end, got, ref)


def test_keep_traced_window_matches():
    """start/end as traced scalars (the no-recompile path) give the same
    factors as python floats."""
    n = 10
    f = jax.jit(lambda i, s, e: control_keep(i, n, s, e))
    for start, end in ((0.0, 1.0), (0.2, 0.8), (0.5, 1.0)):
        ref = _reference_controlnet_keep(n, start, end)
        got = [float(f(i, jnp.float32(start), jnp.float32(end))) for i in range(n)]
        assert got == ref


def test_step_index_mapping_ddim_and_unipc_tables():
    """DDIM/PLMS tables are stored ascending and sampled high→low; UniPC/DPM
    tables are stored descending and sampled in order. Both must map the
    model timestep to the same sampling-order index the reference's
    `enumerate(timesteps)` uses."""
    from prompt_diffusion_tpu.schedulers.ddim import DDIMTables
    from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
    from prompt_diffusion_tpu.schedulers.unipc import UniPCTables

    sched = DiffusionSchedule.create()
    dt = DDIMTables.create(sched, 10)
    S = int(dt.timesteps.shape[0])
    # sampling visits table indices S-1 → 0 (ddim_hacked.py:150-151)
    for sampling_i, table_idx in enumerate(range(S - 1, -1, -1)):
        got = int(step_index_from_timestep(dt.timesteps, dt.timesteps[table_idx]))
        assert got == sampling_i

    ut = UniPCTables.create(sched, 10)
    for i in range(int(ut.timesteps.shape[0])):
        assert int(step_index_from_timestep(ut.timesteps, ut.timesteps[i])) == i


def test_default_window_detection_and_validation():
    assert is_default_window(0.0, 1.0)
    assert is_default_window(0, 1)
    assert not is_default_window(0.1, 1.0)
    assert not is_default_window(jnp.float32(0.0), 1.0)  # traced → windowed
    validate_window(0.0, 1.0)
    with pytest.raises(ValueError, match="cannot be larger or equal"):
        validate_window(0.5, 0.5)
    with pytest.raises(ValueError, match="must be in"):
        validate_window(-0.1, 1.0)
    with pytest.raises(ValueError, match="must be in"):
        validate_window(0.0, 1.5)


# ---- end-to-end: SD1.5 pipeline --------------------------------------------


@pytest.fixture(scope="module")
def sd15(tiny_pipeline):  # noqa: F811 (fixture injection)
    pipe, params = tiny_pipeline
    return pipe, _perturb_zero_init(params)


def _sd15_inputs(b=1):
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, 100, (b, 77)), jnp.int32)
    pair = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 6)), jnp.float32)
    query = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32)
    return ids, jnp.zeros_like(ids), pair, query


def test_sd15_full_off_window_equals_scale_zero(sd15):
    """A window that keeps no step (start=0.99 with 4 steps drops all of
    them) must reproduce control_scale=0 exactly — the reference runs the
    ControlNet with cond_scale 0 on dropped steps, it does not skip it."""
    pipe, params = sd15
    gen = pipe.jit_generate()
    ids, neg, pair, query = _sd15_inputs()
    key = jax.random.PRNGKey(4)
    off = gen(params, key, ids, neg, pair, query, num_steps=4,
              control_guidance_start=0.99, control_guidance_end=1.0)
    zero = gen(params, key, ids, neg, pair, query, num_steps=4,
               control_scale=0.0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(zero), atol=1e-6)
    # and the default window differs from all-off (control is live)
    full = gen(params, key, ids, neg, pair, query, num_steps=4)
    assert not np.allclose(np.asarray(full), np.asarray(off), atol=1e-6)


def test_sd15_explicit_default_window_is_noop(sd15):
    """(0.0, 1.0) — python floats or traced scalars — must match the
    unwindowed program: every step's keep factor is 1."""
    pipe, params = sd15
    gen = pipe.jit_generate()
    ids, neg, pair, query = _sd15_inputs()
    key = jax.random.PRNGKey(5)
    base = gen(params, key, ids, neg, pair, query, num_steps=3)
    py = gen(params, key, ids, neg, pair, query, num_steps=3,
             control_guidance_start=0.0, control_guidance_end=1.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(py))
    traced = gen(params, key, ids, neg, pair, query, num_steps=3,
                 control_guidance_start=jnp.float32(0.0),
                 control_guidance_end=jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(base), np.asarray(traced), atol=1e-6)


def test_sd15_partial_windows_differ_and_compose(sd15):
    """First-half vs last-half windows produce distinct images, and both
    differ from all-on/all-off — the keep factor really gates per step in
    sampling order."""
    pipe, params = sd15
    gen = pipe.jit_generate()
    ids, neg, pair, query = _sd15_inputs()
    key = jax.random.PRNGKey(6)
    kw = dict(num_steps=4, guidance_scale=7.0)
    full = np.asarray(gen(params, key, ids, neg, pair, query, **kw))
    first = np.asarray(gen(params, key, ids, neg, pair, query, **kw,
                           control_guidance_start=0.0, control_guidance_end=0.5))
    last = np.asarray(gen(params, key, ids, neg, pair, query, **kw,
                          control_guidance_start=0.5, control_guidance_end=1.0))
    off = np.asarray(gen(params, key, ids, neg, pair, query, **kw,
                         control_scale=0.0))
    for a, b in [(first, last), (first, full), (last, full), (first, off), (last, off)]:
        assert not np.allclose(a, b, atol=1e-6)


def test_sd15_window_with_guess_mode_and_samplers(sd15):
    """The window composes with guess-mode tap decay (scales are a tuple)
    and with every sampler's table ordering."""
    pipe, params = sd15
    gen = pipe.jit_generate()
    ids, neg, pair, query = _sd15_inputs()
    key = jax.random.PRNGKey(7)
    g = gen(params, key, ids, neg, pair, query, num_steps=3, guess_mode=True,
            control_guidance_start=0.0, control_guidance_end=0.67)
    assert np.isfinite(np.asarray(g)).all()
    for s in ("unipc", "dpm++", "plms"):
        out = gen(params, key, ids, neg, pair, query, num_steps=3, sampler=s,
                  control_guidance_start=0.0, control_guidance_end=0.67)
        assert np.isfinite(np.asarray(out)).all(), s
        base = gen(params, key, ids, neg, pair, query, num_steps=3, sampler=s)
        assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-6), s


def test_sd15_invalid_window_rejected(sd15):
    pipe, params = sd15
    ids, neg, pair, query = _sd15_inputs()
    with pytest.raises(ValueError, match="cannot be larger or equal"):
        pipe.generate(params, jax.random.PRNGKey(0), ids, neg, pair, query,
                      num_steps=2, control_guidance_start=0.8,
                      control_guidance_end=0.2)


# ---- end-to-end: SD3 pipeline ----------------------------------------------


def test_sd3_window_equivalences(sd3):  # noqa: F811 (fixture injection)
    pipe, params = sd3
    params = _perturb_zero_init(params)  # taps are zero-init (zero_module)
    gen = pipe.jit_generate()
    ids = {"l": jnp.zeros((1, 77), jnp.int32), "g": jnp.zeros((1, 77), jnp.int32)}
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    key = jax.random.PRNGKey(8)

    full = gen(params, key, ids, ids, img, img, img, num_steps=4)
    # all-off window == conditioning_scale 0
    off = gen(params, key, ids, ids, img, img, img, num_steps=4,
              control_guidance_start=0.99, control_guidance_end=1.0)
    zero = gen(params, key, ids, ids, img, img, img, num_steps=4,
               controlnet_conditioning_scale=0.0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(zero), atol=1e-6)
    assert not np.allclose(np.asarray(full), np.asarray(off), atol=1e-6)
    # explicit default == unwindowed
    dflt = gen(params, key, ids, ids, img, img, img, num_steps=4,
               control_guidance_start=0.0, control_guidance_end=1.0)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(dflt))
    # half-windows differ
    first = gen(params, key, ids, ids, img, img, img, num_steps=4,
                control_guidance_end=0.5)
    last = gen(params, key, ids, ids, img, img, img, num_steps=4,
               control_guidance_start=0.5)
    assert not np.allclose(np.asarray(first), np.asarray(last), atol=1e-6)
    with pytest.raises(ValueError, match="cannot be larger or equal"):
        pipe.generate(params, key, ids, ids, img, img, img, num_steps=2,
                      control_guidance_start=0.9, control_guidance_end=0.1)
