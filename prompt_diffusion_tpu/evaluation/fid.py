"""Distributed FID (eval/fid.py port, TPU-native).

The reference computes FID with a rank-sharded Inception-v3 feature pass,
NCCL `all_reduce` of (Σx, Σxxᵀ) and a rank-0 Fréchet distance
(eval/fid.py:23-136). Here:

  * features come from any jittable `feature_fn(images01) → (B, D)`;
    `inception.InceptionV3` (weights imported from the standard
    pt_inception checkpoint) is the parity extractor, and any embedding
    model works for relative comparisons.
  * per-device partial sums reduce with `jax.lax.psum` under shard_map
    over the mesh — the exact analogue of the NCCL all_reduce — or, in
    the single-process path, a simple batched scan.
  * the Fréchet distance uses the symmetric-PSD form
    tr(Σ1) + tr(Σ2) − 2·tr(sqrtm(Σ1^{1/2} Σ2 Σ1^{1/2}))
    (equals the reference's sqrtm(Σ1Σ2) trace, but numerically stable
    via eigh; scipy.linalg.sqrtm is matched within tolerance).

CLI (mirrors `fid.py calc/ref`):
  python -m prompt_diffusion_tpu.evaluation.fid ref  --images DIR --out ref.npz
  python -m prompt_diffusion_tpu.evaluation.fid calc --images DIR --ref ref.npz
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class FeatureStats:
    """Streaming (Σx, Σxxᵀ, n) — merge-able across shards/hosts."""

    raw_sum: np.ndarray  # (D,)
    raw_outer: np.ndarray  # (D, D)
    count: int

    @classmethod
    def zero(cls, dim: int) -> "FeatureStats":
        return cls(np.zeros(dim, np.float64), np.zeros((dim, dim), np.float64), 0)

    def update(self, feats: np.ndarray) -> "FeatureStats":
        f = feats.astype(np.float64)
        return FeatureStats(
            self.raw_sum + f.sum(0), self.raw_outer + f.T @ f, self.count + len(f)
        )

    def merge(self, other: "FeatureStats") -> "FeatureStats":
        return FeatureStats(
            self.raw_sum + other.raw_sum,
            self.raw_outer + other.raw_outer,
            self.count + other.count,
        )

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.raw_sum / self.count
        sigma = self.raw_outer / self.count - np.outer(mu, mu)
        # unbiased (matches np.cov / reference eval/fid.py:70-75)
        sigma = sigma * (self.count / max(self.count - 1, 1))
        return mu, sigma

    def save(self, path: str):
        np.savez(path, raw_sum=self.raw_sum, raw_outer=self.raw_outer, count=self.count)

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        z = np.load(path)
        return cls(z["raw_sum"], z["raw_outer"], int(z["count"]))


def psum_stats(raw_sum: jnp.ndarray, raw_outer: jnp.ndarray, count: jnp.ndarray, axis):
    """In-pjit reduction of partial stats (the NCCL all_reduce equivalent,
    eval/fid.py:73-74). Call inside shard_map over the data axis (or a
    tuple of axes)."""
    return (
        jax.lax.psum(raw_sum, axis),
        jax.lax.psum(raw_outer, axis),
        jax.lax.psum(count, axis),
    )


def _make_sharded_stats_run(feature_fn, mesh):
    """Build the jitted shard_map program ONCE — callers streaming many
    batches must reuse it (a fresh closure per batch would recompile the
    whole feature graph every time)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    axes = tuple(mesh.axis_names)

    def shard_fn(xs):
        f = feature_fn(xs).astype(jnp.float32)
        return psum_stats(jnp.sum(f, 0), f.T @ f,
                          jnp.asarray(xs.shape[0], jnp.float32), axes)

    run = jax.jit(
        shard_map(shard_fn, mesh=mesh, in_specs=P(axes), out_specs=(P(), P(), P()))
    )

    def call(images) -> FeatureStats:
        x = jax.device_put(jnp.asarray(images), NamedSharding(mesh, P(axes)))
        s, o, c = run(x)
        return FeatureStats(
            np.asarray(s, np.float64), np.asarray(o, np.float64), int(c)
        )

    return call


def compute_stats_sharded(
    feature_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: np.ndarray,
    mesh,
) -> FeatureStats:
    """Multi-device feature pass: batch sharded over every mesh axis, each
    device computes its shard's (Σx, Σxxᵀ, n), reduced in-graph with
    `psum_stats` — the exact analogue of the reference's per-rank feature
    pass + NCCL all_reduce (eval/fid.py:53-77). `images` (N,H,W,3) in
    [0,1]; N must divide by the device count."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if images.shape[0] % n_dev:
        raise ValueError(f"batch {images.shape[0]} not divisible by {n_dev} devices")
    return _make_sharded_stats_run(feature_fn, mesh)(images)


def compute_stats_from_iterator_sharded(
    feature_fn, batches: Iterator[np.ndarray], feature_dim: int, mesh
) -> FeatureStats:
    """Streaming variant of `compute_stats_sharded`: full device-multiples
    go through the sharded psum path; a final partial batch falls back to
    the single-device path (padding would corrupt the statistics)."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    stats = FeatureStats.zero(feature_dim)
    single = jax.jit(feature_fn)
    run = _make_sharded_stats_run(feature_fn, mesh)  # ONE program for the stream
    for batch in batches:
        n_full = (batch.shape[0] // n_dev) * n_dev
        if n_full:
            stats = stats.merge(run(batch[:n_full]))
        if n_full < batch.shape[0]:
            stats = stats.update(np.asarray(single(jnp.asarray(batch[n_full:]))))
    return stats


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(a)
    vals = np.clip(vals, 0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians (eval/fid.py:82-86 semantics)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1, s2 = np.asarray(sigma1, np.float64), np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(s1)
    covmean = _sqrtm_psd(s1_half @ s2 @ s1_half)
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * np.trace(covmean))


def compute_stats_from_iterator(
    feature_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batches: Iterator[np.ndarray],
    feature_dim: int,
) -> FeatureStats:
    """Single-process path: stream batches (B,H,W,3 in [0,1]) → stats."""
    stats = FeatureStats.zero(feature_dim)
    f = jax.jit(feature_fn)
    for batch in batches:
        feats = np.asarray(f(jnp.asarray(batch)))
        stats = stats.update(feats)
    return stats


def fid_between_dirs(
    feature_fn, feature_dim: int, dir_gen: str, ref_stats_path: str,
    batch_size: int = 32, mesh=None,
) -> float:
    """FID between an image directory and saved reference stats — the
    library form of the CLI's `calc` mode (which calls this). `mesh`
    shards the feature pass over the devices with an in-graph psum
    (reference eval/fid.py:53-77 rank-sharding + all_reduce)."""
    batches = _image_dir_batches(dir_gen, batch_size)
    if mesh is not None:
        stats = compute_stats_from_iterator_sharded(
            feature_fn, batches, feature_dim, mesh)
    else:
        stats = compute_stats_from_iterator(feature_fn, batches, feature_dim)
    mu_g, sig_g = stats.finalize()
    mu_r, sig_r = FeatureStats.load(ref_stats_path).finalize()
    return frechet_distance(mu_g, sig_g, mu_r, sig_r)


def _image_dir_batches(directory: str, batch_size: int, res: int = 299):
    from PIL import Image

    files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    for i in range(0, len(files), batch_size):
        imgs = [
            np.asarray(
                Image.open(f).convert("RGB").resize((res, res), Image.BILINEAR),
                dtype=np.float32,
            )
            / 255.0
            for f in files[i : i + batch_size]
        ]
        yield np.stack(imgs)


def _default_feature_fn():
    from prompt_diffusion_tpu.evaluation.inception import InceptionV3, load_inception_params

    model = InceptionV3()
    params = load_inception_params()
    return (lambda x: model.apply(params, x)), 2048


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["calc", "ref"])
    p.add_argument("--images", required=True)
    p.add_argument("--ref", default=None)
    p.add_argument("--out", default="fid_ref.npz")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument(
        "--sharded", action="store_true",
        help="shard the feature pass over all devices with an in-graph "
        "psum reduction (reference eval/fid.py rank-sharding + NCCL "
        "all_reduce); multi-host works after jax.distributed.initialize()",
    )
    args = p.parse_args()
    if args.mode == "calc" and not args.ref:
        p.error("calc mode requires --ref (run `ref` mode first)")

    feature_fn, dim = _default_feature_fn()
    mesh = None
    if args.sharded and jax.device_count() > 1:
        from prompt_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    if args.mode == "ref":
        batches = _image_dir_batches(args.images, args.batch)
        if mesh is not None:
            stats = compute_stats_from_iterator_sharded(
                feature_fn, batches, dim, mesh)
        else:
            stats = compute_stats_from_iterator(feature_fn, batches, dim)
        stats.save(args.out)
        print(f"saved reference stats ({stats.count} images) → {args.out}")
    else:
        fid = fid_between_dirs(feature_fn, dim, args.images, args.ref,
                               args.batch, mesh=mesh)
        print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
