"""Batched offline condition extraction (annotate_data.py port).

The reference annotates one image at a time on GPU (HED, UniFormer seg,
MiDaS depth+normal per image, annotate_data.py:36-54) with manual
`--i_start/--i_end` process sharding. Here extraction is **batched and
jitted on-device** (BASELINE.json config 3): images stream through a
host-side loader, each annotator runs as one batched XLA program, and
sharding uses the same --i-start/--i-end contract.

  python annotate_data.py --path data/instruct-pix2pix --batch-size 16 \
      [--hed-ckpt network-bsds500.pth] [--midas-ckpt dpt_large.pt] \
      [--seg-ckpt upernet_global_small.pth] [--tasks canny hed depth normal seg]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--path", required=True, help="root with seeds.json (InstructPix2Pix layout)")
    p.add_argument("--i-start", type=int, default=0)
    p.add_argument("--i-end", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--tasks", nargs="+", default=["canny"],
                   choices=["canny", "hed", "depth", "normal", "seg"])
    p.add_argument("--hed-ckpt", default=None)
    p.add_argument("--midas-ckpt", default=None)
    p.add_argument("--seg-ckpt", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    seeds_path = os.path.join(args.path, "seeds.json")
    if os.path.exists(seeds_path):
        with open(seeds_path) as f:
            seeds = json.load(f)
        entries = [
            os.path.join(args.path, name, f"{seed}.jpg")
            for name, image_seeds in seeds for seed in image_seeds
        ]
    else:  # plain directory tree of jpgs
        from glob import glob

        entries = sorted(glob(os.path.join(args.path, "**", "*.jpg"), recursive=True))
    entries = entries[args.i_start : args.i_end]
    print(f"{len(entries)} images, tasks={args.tasks}")

    # build jitted annotator fns
    fns = {}
    if "canny" in args.tasks:
        from prompt_diffusion_tpu.annotators.canny import canny

        fns["canny"] = lambda x: canny(x)  # (B,H,W) {0,255}
    if "hed" in args.tasks:
        from prompt_diffusion_tpu.annotators.hed import HEDNetwork, import_hed_checkpoint

        net = HEDNetwork()
        hp = import_hed_checkpoint(args.hed_ckpt)
        fns["hed"] = jax.jit(lambda x: net.apply(hp, x) * 255.0)
    if "depth" in args.tasks or "normal" in args.tasks:
        from prompt_diffusion_tpu.annotators.midas import (
            create_dpt, depth_to_normals)

        dpt, dp = create_dpt(args.midas_ckpt)

        @jax.jit
        def midas_fn(x):
            depth = dpt.apply(dp, x / 127.5 - 1.0)
            d01, normals = depth_to_normals(depth)
            return d01 * 255.0, normals * 255.0

        fns["midas"] = midas_fn
    if "seg" in args.tasks:
        from prompt_diffusion_tpu.annotators.uniformer import (
            UniFormerSeg, colorize_segmentation, import_uniformer_checkpoint)

        seg = UniFormerSeg()
        sp = import_uniformer_checkpoint(args.seg_ckpt)
        seg_logits = jax.jit(lambda x: jnp.argmax(seg.apply(sp, x), axis=-1))
        fns["seg"] = seg_logits

    def save(path_in, suffix, arr_u8):
        out = path_in.replace(".jpg", f"_{suffix}.jpg")
        Image.fromarray(arr_u8).save(out)

    res = args.resolution
    for s in range(0, len(entries), args.batch_size):
        paths = [p for p in entries[s : s + args.batch_size] if os.path.exists(p)]
        if not paths:
            continue
        imgs = np.stack([
            np.asarray(Image.open(p).convert("RGB").resize((res, res), Image.BILINEAR),
                       np.float32)
            for p in paths
        ])
        x = jnp.asarray(imgs)
        if "canny" in fns:
            edges = np.asarray(fns["canny"](x)).astype(np.uint8)
            for p, e in zip(paths, edges):
                save(p, "canny", np.repeat(e[..., None], 3, -1))
        if "hed" in fns:
            hed = np.clip(np.asarray(fns["hed"](x)), 0, 255).astype(np.uint8)
            for p, e in zip(paths, hed):
                save(p, "hed", np.repeat(e[..., None], 3, -1))
        if "midas" in fns:
            d, n = fns["midas"](x)
            for p, di, ni in zip(paths, np.asarray(d), np.asarray(n)):
                save(p, "depth", np.repeat(di[..., None].astype(np.uint8), 3, -1))
                save(p, "normal", ni.astype(np.uint8))
        if "seg" in fns:
            cls = np.asarray(fns["seg"](x))
            for p, ci in zip(paths, cls):
                save(p, "seg", colorize_segmentation(ci))
        print(f"annotated {s + len(paths)}/{len(entries)}")


if __name__ == "__main__":
    main()
