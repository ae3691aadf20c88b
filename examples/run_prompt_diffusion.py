"""Canonical single-example Prompt-Diffusion inference (the notebook flow).

Script equivalent of `run_prompt_diffusion.ipynb`: given a vision-language
prompt — (example condition, example image) pair + query condition + text —
generate the query's image. Task dispatch and preprocessing follow notebook
cell 4 `prepair_input`: conditions from the live annotators (or inverse
tasks feeding images directly), query normalized to [-1,1], example pair =
channel-concat(condition, image); sampling follows cell 5 `process`
(DDIM, CFG 9.0, control_scales = strength or guess-mode 0.825^(12−i)).

  python examples/run_prompt_diffusion.py \
      --ckpt network-step=04999.ckpt --tokenizer-assets ./clip_assets \
      --example-image house.png --query-image house_line.png \
      --task hed --prompt "a beautiful house" --out out.png
"""

from __future__ import annotations

import argparse

import numpy as np

A_PROMPT = "best quality, extremely detailed"
N_PROMPT = "longbody, lowres, bad anatomy, bad hands, missing fingers, extra digit, fewer digits, cropped, worst quality, low quality"

TASKS = ("hed", "seg", "depth", "normal", "canny",
         "inv_hed", "inv_seg", "inv_depth", "inv_normal", "inv_canny")


def extract_condition(image_u8: np.ndarray, task: str, ckpts: dict) -> np.ndarray:
    """uint8 HWC → condition uint8 HWC for a forward task.

    Mirrors notebook cell 4's annotator dispatch (apply_hed / apply_midas /
    apply_uniformer / cv2.Canny); weighted annotators need a checkpoint path
    in `ckpts` ({"hed": ..., "midas": ..., "seg": ...})."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(image_u8[None].astype(np.float32))
    if task == "canny":
        from prompt_diffusion_tpu.annotators.canny import canny

        edge = np.asarray(canny(x))[0]
        return np.repeat(edge[..., None].astype(np.uint8), 3, axis=-1)

    def need(key, flag):
        if not ckpts.get(key):
            raise SystemExit(f"--task {task} needs annotator weights: pass {flag}")
        return ckpts[key]

    if task == "hed":
        from prompt_diffusion_tpu.annotators.hed import HEDNetwork, import_hed_checkpoint

        net = HEDNetwork()
        params = import_hed_checkpoint(need("hed", "--hed-ckpt"))
        e = np.clip(np.asarray(jax.jit(net.apply)(params, x))[0] * 255.0, 0, 255)
        return np.repeat(e[..., None].astype(np.uint8), 3, axis=-1)
    if task in ("depth", "normal"):
        from prompt_diffusion_tpu.annotators.midas import (
            create_dpt, depth_to_normals)

        # dpt_hybrid (ecosystem default) or dpt_large, sniffed from the file
        dpt, params = create_dpt(need("midas", "--midas-ckpt"))
        depth = jax.jit(dpt.apply)(params, x / 127.5 - 1.0)
        d01, normals = depth_to_normals(depth)
        out = np.asarray(d01 if task == "depth" else normals)[0] * 255.0
        out = np.clip(out, 0, 255).astype(np.uint8)
        return np.repeat(out[..., None], 3, -1) if out.ndim == 2 else out
    if task == "seg":
        from prompt_diffusion_tpu.annotators.uniformer import (
            UniFormerSeg, colorize_segmentation, import_uniformer_checkpoint)

        seg = UniFormerSeg()
        params = import_uniformer_checkpoint(need("seg", "--seg-ckpt"))
        classes = np.asarray(jnp.argmax(jax.jit(seg.apply)(params, x), axis=-1))[0]
        return colorize_segmentation(classes)
    raise SystemExit(f"unknown forward task '{task}'")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--tokenizer-assets", default=None)
    p.add_argument("--example-image", required=True, help="support ground-truth image")
    p.add_argument("--example-cond", default=None,
                   help="precomputed support condition (else run the annotator)")
    p.add_argument("--query-image", required=True,
                   help="query condition image (forward task) or image (inverse task)")
    p.add_argument("--task", choices=TASKS, default="hed")
    p.add_argument("--hed-ckpt", default=None, help="network-bsds500.pth")
    p.add_argument("--midas-ckpt", default=None, help="dpt_hybrid/dpt_large .pt")
    p.add_argument("--seg-ckpt", default=None, help="upernet_global_small.pth")
    p.add_argument("--prompt", required=True)
    p.add_argument("--a-prompt", default=A_PROMPT)
    p.add_argument("--n-prompt", default=N_PROMPT)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg", type=float, default=9.0)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--guess-mode", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="out.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from prompt_diffusion_tpu.annotators.util import hwc3, resize_image
    from prompt_diffusion_tpu.data.tokenizer import load_tokenizer
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.tools.torch_import import import_ldm_checkpoint

    res = args.resolution

    def load(path):
        return resize_image(hwc3(np.asarray(Image.open(path).convert("RGB"))), res)

    example_img = load(args.example_image)
    query = load(args.query_image)
    if args.example_cond:
        example_cond = load(args.example_cond)
    else:
        example_cond = extract_condition(
            example_img, args.task.removeprefix("inv_"),
            {"hed": args.hed_ckpt, "midas": args.midas_ckpt, "seg": args.seg_ckpt})

    if args.task.startswith("inv_"):
        # inverse task: condition is the *target*; pair = (image, condition)
        example_cond, example_img = example_img, example_cond

    pair = np.concatenate(
        [example_cond.astype(np.float32) / 127.5 - 1.0,
         example_img.astype(np.float32) / 127.5 - 1.0], axis=-1)
    query_m11 = query.astype(np.float32) / 127.5 - 1.0

    pipe = PromptDiffusionSD15.create()
    params = import_ldm_checkpoint(args.ckpt)
    tok = load_tokenizer(args.tokenizer_assets)
    ids = jnp.asarray(tok([args.prompt + ", " + args.a_prompt]))
    neg = jnp.asarray(tok([args.n_prompt]))

    gen = pipe.jit_generate()
    img = gen(
        params, jax.random.PRNGKey(args.seed), ids, neg,
        jnp.asarray(pair[None]), jnp.asarray(query_m11[None]),
        num_steps=args.steps, guidance_scale=args.cfg,
        control_scale=args.strength, guess_mode=args.guess_mode,
    )
    out = (np.asarray(img[0]) * 255).astype(np.uint8)
    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
