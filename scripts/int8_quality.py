"""int8 W8A8 quality validation vs bf16 (VERDICT r2 next-round #2).

Protocol (runs on the chip with no external weights — random-init params
with LIVE zero-conv heads, identical seeds across modes):

  1. Generate N images per mode (bf16 / int8) from identical x_T.
  2. FID(bf16-set, int8-set) with the in-repo Inception features, against
     the self-calibrated floor FID(bf16-half-A, bf16-half-B): int8 passes
     when its distributional drift is within ~2x the same-mode sampling
     split (identical protocol, disjoint seeds).
  3. Per-step ε relative error on the FULL model at t∈{1,250,500,750,999}.
  4. Pairwise SSIM(bf16_i, int8_i) distribution.

Usage:
  python scripts/int8_quality.py --stack sd15 --n 256 --batch 4
  python scripts/int8_quality.py --stack sd3  --n 96 --batch 1

Emits one JSON line per metric; summary recorded in docs/ROADMAP.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

_T0 = time.perf_counter()


def log(m):
    print(f"[int8q +{time.perf_counter() - _T0:.0f}s] {m}", file=sys.stderr, flush=True)


def perturb_zero_init(params, scale=0.01):
    """Give zero-init heads/taps live weights (see tests/test_pipeline_sd15)."""
    i = [0]

    def f(x):
        if x.ndim >= 2 and not np.any(np.asarray(x)):
            i[0] += 1
            return x + scale * jax.random.normal(
                jax.random.PRNGKey(1000 + i[0]), x.shape, x.dtype)
        return x

    return jax.tree_util.tree_map(f, params)


from prompt_diffusion_tpu.evaluation.ssim import batch_ssim as ssim  # noqa: E402


def build_sd15(int8: bool, size: int, vae_int8: bool = False):
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.utils.dtypes import int8_policy

    pipe = PromptDiffusionSD15.create(policy=int8_policy() if int8 else None,
                                      vae_int8=int8 and vae_int8)
    return pipe


def gen_sd15(pipe, params, n, batch, size, steps, tag):
    gen = pipe.jit_generate()
    ids = jnp.zeros((batch, 77), jnp.int32)
    rngq = np.random.default_rng(7)
    pair = jnp.asarray(rngq.uniform(-1, 1, (batch, size, size, 6)), jnp.float32)
    query = jnp.asarray(rngq.uniform(-1, 1, (batch, size, size, 3)), jnp.float32)
    imgs = []
    t0 = time.perf_counter()
    for i in range(n // batch):
        noise = jax.vmap(lambda s: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(5), s), (size // 8, size // 8, 4)))(
            jnp.arange(i * batch, (i + 1) * batch, dtype=jnp.uint32))
        out = gen(params, jax.random.PRNGKey(0), ids, ids, pair, query,
                  num_steps=steps, guidance_scale=9.0, init_noise=noise)
        imgs.append(np.asarray(out))
        if i == 0:
            log(f"{tag}: compiled+first batch in {time.perf_counter() - t0:.0f}s")
    log(f"{tag}: {n} images in {time.perf_counter() - t0:.0f}s")
    return np.concatenate(imgs)


def eps_relerr_sd15(pipe_bf, pipe_i8, params, size):
    """Full-model ε(bf16) vs ε(int8) rel-err at spread timesteps."""
    rng = np.random.default_rng(3)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, size // 8, size // 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, 77, 768)) * 0.3, jnp.float32)
    pair = jnp.asarray(rng.uniform(-1, 1, (b, size, size, 6)), jnp.float32)
    query = jnp.asarray(rng.uniform(-1, 1, (b, size, size, 3)), jnp.float32)

    def eps(pipe, p, tb):
        # params MUST be a jit argument, not a closure capture — captured
        # params become multi-GB inline constants in the lowered program,
        # which stalls the remote-compile tunnel
        control = pipe.controlnet.apply(p["controlnet"], x, tb, pair, query, ctx)
        return pipe.unet.apply(p["unet"], x, tb, ctx, control=control)

    # t is traced → ONE compile per pipe, not one per timestep
    eps_bf = jax.jit(lambda p, tb: eps(pipe_bf, p, tb))
    eps_i8 = jax.jit(lambda p, tb: eps(pipe_i8, p, tb))
    errs = {}
    for t in (1, 250, 500, 750, 999):
        tb = jnp.full((b,), t, jnp.int32)
        a = np.asarray(eps_bf(params, tb)).astype(np.float64)
        c = np.asarray(eps_i8(params, tb)).astype(np.float64)
        errs[t] = float(np.linalg.norm(c - a) / max(np.linalg.norm(a), 1e-9))
    return errs


def build_sd3(int8: bool, vae_int8: bool = False):
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3
    from prompt_diffusion_tpu.utils.dtypes import int8_policy

    return PromptDiffusionSD3.create(policy=int8_policy() if int8 else None,
                                     vae_int8=int8 and vae_int8)


def gen_sd3(pipe, params, n, batch, size, steps, tag):
    gen = pipe.jit_generate()
    ids = {"l": jnp.zeros((batch, 77), jnp.int32), "g": jnp.zeros((batch, 77), jnp.int32)}
    rngq = np.random.default_rng(7)
    img = jnp.asarray(rngq.uniform(-1, 1, (batch, size, size, 3)), jnp.float32)
    zc = pipe.vae.config.z_channels
    imgs = []
    t0 = time.perf_counter()
    for i in range(n // batch):
        noise = jax.vmap(lambda s: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(5), s), (size // 8, size // 8, zc)))(
            jnp.arange(i * batch, (i + 1) * batch, dtype=jnp.uint32))
        out = gen(params, jax.random.PRNGKey(0), ids, ids, img, img, img,
                  num_steps=steps, guidance_scale=7.0, init_noise=noise)
        imgs.append(np.asarray(out))
        if i == 0:
            log(f"{tag}: compiled+first batch in {time.perf_counter() - t0:.0f}s")
    log(f"{tag}: {n} images in {time.perf_counter() - t0:.0f}s")
    return np.concatenate(imgs)


def fid_of(feats_fn, a, b, dim):
    from prompt_diffusion_tpu.evaluation.fid import (
        FeatureStats, compute_stats_from_iterator, frechet_distance)

    sa = compute_stats_from_iterator(feats_fn, iter([a[i:i + 16] for i in range(0, len(a), 16)]), dim)
    sb = compute_stats_from_iterator(feats_fn, iter([b[i:i + 16] for i in range(0, len(b), 16)]), dim)
    return frechet_distance(*sa.finalize(), *sb.finalize())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", choices=["sd15", "sd3"], default="sd15")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--vae-int8", action="store_true",
                    help="int8 pipeline also quantizes the VAE interior convs")
    ap.add_argument("--dump", default=None, metavar="DIR",
                    help="save the generated image sets as .npy under DIR "
                         "(so the FID/SSIM stages can rerun without paying "
                         "~35 min of chip generation again)")
    ap.add_argument("--from-dump", default=None, metavar="DIR",
                    help="skip generation; load bf16/int8 image sets from DIR")
    ap.add_argument("--bf16-from-dump", default=None, metavar="DIR",
                    help="load only the bf16 set from DIR (reuses ~half the "
                         "chip time when gating an int8 VARIANT, e.g. "
                         "--vae-int8, against an already-dumped bf16 set)")
    args = ap.parse_args()
    size = args.size or (512 if args.stack == "sd15" else 1024)
    steps = args.steps or (50 if args.stack == "sd15" else 28)

    from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

    if args.from_dump:
        imgs_bf = np.load(os.path.join(args.from_dump, f"{args.stack}_bf16.npy"))
        imgs_i8 = np.load(os.path.join(args.from_dump, f"{args.stack}_int8.npy"))
        log(f"loaded {len(imgs_bf)}+{len(imgs_i8)} images from {args.from_dump}")
    elif args.stack == "sd15":
        pipe_bf = build_sd15(False, size)
        pipe_i8 = build_sd15(True, size, vae_int8=args.vae_int8)
        log("init params...")
        params = jax.jit(lambda r: pipe_bf.init_params(r, image_size=size))(
            jax.random.PRNGKey(0))
        params = perturb_zero_init(params)
        jax.block_until_ready(params)
        errs = eps_relerr_sd15(pipe_bf, pipe_i8, params, size)
        print(json.dumps({"metric": "sd15 eps rel-err by t", "value": errs}), flush=True)
        if args.bf16_from_dump:
            imgs_bf = np.load(
                os.path.join(args.bf16_from_dump, f"{args.stack}_bf16.npy"))
            log(f"loaded {len(imgs_bf)} bf16 images from {args.bf16_from_dump}")
        else:
            imgs_bf = gen_sd15(pipe_bf, params, args.n, args.batch, size, steps, "bf16")
        imgs_i8 = gen_sd15(pipe_i8, params, args.n, args.batch, size, steps, "int8")
    else:
        pipe_bf = build_sd3(False)
        pipe_i8 = build_sd3(True, vae_int8=args.vae_int8)
        log("init SD3 params (bf16 weights)...")
        params = jax.jit(lambda r: cast_params_bf16(
            pipe_bf.init_params(r, image_size=size, batch=1)))(jax.random.PRNGKey(0))
        params = perturb_zero_init(params)
        jax.block_until_ready(params)
        if args.bf16_from_dump:
            imgs_bf = np.load(
                os.path.join(args.bf16_from_dump, f"{args.stack}_bf16.npy"))
            log(f"loaded {len(imgs_bf)} bf16 images from {args.bf16_from_dump}")
        else:
            imgs_bf = gen_sd3(pipe_bf, params, args.n, args.batch, size, steps, "bf16")
        imgs_i8 = gen_sd3(pipe_i8, params, args.n, args.batch, size, steps, "int8")

    if args.dump and not args.from_dump:
        os.makedirs(args.dump, exist_ok=True)
        np.save(os.path.join(args.dump, f"{args.stack}_bf16.npy"), imgs_bf)
        np.save(os.path.join(args.dump, f"{args.stack}_int8.npy"), imgs_i8)
        log(f"dumped image sets to {args.dump}")

    # SSIM distribution (identical seeds → pairwise comparable)
    s = ssim(imgs_bf, imgs_i8)
    print(json.dumps({
        "metric": f"{args.stack} SSIM(bf16_i, int8_i)",
        "p05": round(float(np.percentile(s, 5)), 4),
        "p50": round(float(np.percentile(s, 50)), 4),
        "mean": round(float(s.mean()), 4),
    }), flush=True)

    # FID vs the same-mode split floor
    from prompt_diffusion_tpu.evaluation.inception import InceptionV3, load_inception_params

    model = InceptionV3()
    iparams = load_inception_params()
    feats_fn = lambda x: model.apply(iparams, x)
    h = len(imgs_bf) // 2
    floor = fid_of(feats_fn, imgs_bf[:h], imgs_bf[h:], 2048)
    cross = fid_of(feats_fn, imgs_bf, imgs_i8, 2048)
    cross_same_seed = fid_of(feats_fn, imgs_bf[:h], imgs_i8[:h], 2048)
    verdict = "PASS" if cross <= max(2 * floor, floor + 1e-3) else "FAIL"
    print(json.dumps({
        "metric": f"{args.stack} FID drift (random-init relative features)",
        "fid_bf16_split_floor": round(floor, 4),
        "fid_bf16_vs_int8": round(cross, 4),
        "fid_bf16_vs_int8_same_seeds_half": round(cross_same_seed, 4),
        "acceptance": "cross <= 2x same-mode split floor",
        "verdict": verdict,
    }), flush=True)


if __name__ == "__main__":
    main()
