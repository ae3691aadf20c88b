"""Benchmarks for every BASELINE.md config. Default (no args) runs the
north-star config and prints ONE JSON line {"metric","value","unit",
"vs_baseline"} — the contract the driver records in BENCH_r{N}.json.

Configs (BASELINE.json `configs` 1-5):
  --config sd15     512², 50-step DDIM, CFG 9, batch 4 — the headline
                    (covers configs 1+2: notebook flow and the diffusers
                    CFG-double-batched loop are the same jitted program).
  --config sd3      SD3 Prompt-Diffusion 1024², 28-step FlowMatchEuler,
                    CFG 7 (config 4; reference defaults
                    promptdiffusioncontrolnetpipeline_sd3.py:862-864).
  --config annotate batched canny condition extraction @512² (config 3;
                    reference annotates one image at a time on GPU,
                    annotate_data.py:36-54).
  --config train    SD1.5 ControlNet train-step throughput, batch 8,
                    grad-accum 1 (config 5, per-chip number).

vs_baseline: the reference publishes no numbers (SURVEY.md §6); comparison
points are measured community A100 numbers for the same workload, recorded
per-config below.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

_T0 = time.perf_counter()

# A100 fp16+xformers measured community numbers for the same workloads.
A100_SD15_IMGS_PER_SEC = 0.33   # SD1.5+ControlNet 512² 50-step CFG
A100_SD3_IMGS_PER_SEC = 0.10    # SD3-Medium+ControlNet 1024² 28-step CFG
A100_ANNOTATE_IMGS_PER_SEC = 40.0  # cv2.Canny+resize loop, one image at a time
A100_TRAIN_SAMPLES_PER_SEC = 11.0  # reference recipe: batch 64/accum 4 on 8×GPU


def log(msg):
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2),
    }))


def bench_sd15(args):
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15

    if args.int8:
        from prompt_diffusion_tpu.utils.dtypes import int8_policy

        pipe = PromptDiffusionSD15.create(policy=int8_policy(),
                                          vae_int8=args.int8_vae)
    else:
        pipe = PromptDiffusionSD15.create()
    rng = jax.random.PRNGKey(0)
    log("initializing params (jitted init)...")
    params = jax.jit(lambda r: pipe.init_params(r, image_size=args.size))(rng)
    jax.block_until_ready(params)
    if args.bf16_params:
        from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

        params = jax.jit(cast_params_bf16)(params)
        jax.block_until_ready(params)
    log("params ready")

    b = args.batch
    ids = jnp.zeros((b, 77), jnp.int32)
    neg = jnp.zeros((b, 77), jnp.int32)
    pair = jnp.zeros((b, args.size, args.size, 6), jnp.float32)
    query = jnp.zeros((b, args.size, args.size, 3), jnp.float32)

    gen = pipe.jit_generate()

    def run(key):
        return gen(params, key, ids, neg, pair, query,
                   num_steps=args.steps, guidance_scale=9.0,
                   sampler=args.sampler)

    log("compiling generate program...")
    t0 = time.perf_counter()
    readback = lambda out: float(jnp.sum(out))  # async queue: only a
    # device->host readback proves execution finished (see verify skill)
    readback(run(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    log(f"compiled+warm in {compile_s:.0f}s; timing {args.iters} iters")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        readback(run(jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    tag = ", int8 serving mode" if args.int8 else ""
    emit(
        f"images/sec/chip (SD1.5 PromptDiffusion {args.size}px, "
        f"{args.steps}-step {args.sampler.upper()}, CFG, batch {b}{tag})",
        b / best, "img/s", A100_SD15_IMGS_PER_SEC,
    )
    print(
        f"p50_step_ms={best / args.steps * 1e3:.1f} compile_s={compile_s:.1f} "
        f"times={[round(t, 2) for t in times]} device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


def bench_sd3(args):
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3

    size = args.size if args.size != 512 else 1024
    steps = args.steps if args.steps != 50 else 28
    b = args.batch if args.batch != 4 else 1

    if args.int8:
        from prompt_diffusion_tpu.utils.dtypes import int8_policy

        pipe = PromptDiffusionSD3.create(policy=int8_policy(),
                                         vae_int8=args.int8_vae)
    else:
        pipe = PromptDiffusionSD3.create()  # drop_t5 mode (zero-padded T5 slots)

    ids = {"l": jnp.zeros((b, 77), jnp.int32), "g": jnp.zeros((b, 77), jnp.int32)}
    img = jnp.zeros((b, size, size, 3), jnp.float32)

    # The T5 stage must run BEFORE the SD3 params exist on-device: T5-XXL
    # bf16 (9.5 GB) + the SD3 stack (~7 GB) + encode activations exceed one
    # 16 GB chip (measured RESOURCE_EXHAUSTED when ordered the other way).
    t5_seq = neg_t5_seq = None
    t5_encode_s = 0.0
    if args.with_t5:
        # Staged T5-XXL (the real 4.7B encoder config, executed on-chip):
        # init bf16, encode the cond+neg prompts ONCE, then free the 9.5 GB
        # of T5 weights before the denoise program — the triple-encoder
        # graph the reference runs in one process (encode_prompt :351-543),
        # staged because T5-XXL + MMDiT + ControlNet exceed one 16 GB chip.
        from prompt_diffusion_tpu.models.t5_text import T5Encoder

        t5 = T5Encoder()
        t5_ids = jnp.zeros((2 * b, 256), jnp.int32)
        log("initializing T5-XXL params (bf16, eval_shape fast init)...")
        # fast init: flax init traces the full 4.7B forward (~190 s compile
        # on one chip); eval_shape + leaf fills produce the same tree in
        # seconds — this bench runs random weights either way
        from prompt_diffusion_tpu.utils.dtypes import fast_random_params_bf16

        t5_params = fast_random_params_bf16(t5, jax.random.PRNGKey(7), t5_ids)
        jax.block_until_ready(t5_params)
        log("T5-XXL ready; compiling+running staged encode...")
        enc = jax.jit(t5.apply)
        float(jnp.sum(enc(t5_params, t5_ids)))  # compile+warm
        t0 = time.perf_counter()
        both = enc(t5_params, jnp.ones((2 * b, 256), jnp.int32))
        float(jnp.sum(both))
        t5_encode_s = time.perf_counter() - t0
        t5_seq, neg_t5_seq = jnp.split(jax.device_get(both), 2, axis=0)
        t5_seq, neg_t5_seq = jnp.asarray(t5_seq), jnp.asarray(neg_t5_seq)
        del t5_params, both  # frees the XXL weights before the denoise graph
        log(f"T5-XXL staged encode: {t5_encode_s * 1e3:.1f} ms (weights freed)")

    log("initializing SD3 params (jitted init, bf16 weights)...")
    # bf16 weights: the fp32 SD3 stack + 1024² activations exceed one chip's
    # HBM, and the reference serves SD3 in fp16 (torch_dtype=torch.float16
    # quickstart) — halved-precision weights ARE the reference-parity
    # configuration. Init+cast in ONE program so XLA frees each fp32
    # init buffer right after its cast.
    from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

    params = jax.jit(
        lambda r: cast_params_bf16(pipe.init_params(r, image_size=size, batch=1))
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log("params ready (bf16 weights)")

    gen = pipe.jit_generate()

    def run(key):
        return gen(params, key, ids, ids, img, img, img,
                   num_steps=steps, guidance_scale=7.0,
                   t5_seq=t5_seq, neg_t5_seq=neg_t5_seq)

    log("compiling SD3 generate program...")
    t0 = time.perf_counter()
    readback = lambda out: float(jnp.sum(out))
    readback(run(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    log(f"compiled+warm in {compile_s:.0f}s; timing {args.iters} iters")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        readback(run(jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    best = min(times) + t5_encode_s  # T5 runs once per prompt/generate call
    emit(
        f"images/sec/chip (SD3 PromptDiffusion {size}px, {steps}-step "
        f"FlowMatchEuler, CFG, batch {b}"
        f"{', int8 serving mode' if args.int8 else ''}"
        f"{', T5-XXL staged in-graph' if args.with_t5 else ''})",
        b / best, "img/s", A100_SD3_IMGS_PER_SEC,
    )
    print(f"compile_s={compile_s:.1f} times={[round(t, 2) for t in times]}"
          + (f" t5_encode_ms={t5_encode_s * 1e3:.1f}" if args.with_t5 else ""),
          file=sys.stderr)


def bench_annotate(args):
    """BASELINE config 3 — batched on-device condition extraction.

    The reference's annotation pass is HED + UniFormer seg + MiDaS
    depth/normal, one image at a time on GPU (annotate_data.py:36-54);
    canny is the notebook-path condition. `--annotator` picks one net
    (throughput is weight-independent — random bf16 weights through the
    real architectures) or `all` to measure each and emit the full
    reference-pass number (hed+seg+depth/normal per image)."""
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.utils.dtypes import fast_random_params_bf16

    b = max(args.batch, 16)
    size = args.size
    if args.int8:
        from prompt_diffusion_tpu.utils.dtypes import int8_policy

        pol = int8_policy()
    else:
        from prompt_diffusion_tpu.utils.dtypes import default_policy

        pol = default_policy()
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (b, size, size, 3)) * 255.0

    def time_fn(name, run, n_inner=1):
        log(f"compiling batched {name}...")
        t0 = time.perf_counter()
        float(run(x0))
        log(f"{name} compiled in {time.perf_counter() - t0:.0f}s; timing")
        times = []
        for i in range(max(args.iters, 3)):
            xi = x0 * (1.0 + 1e-4 * (i + 1))
            float(jnp.sum(xi))
            t0 = time.perf_counter()
            float(run(xi))
            times.append(time.perf_counter() - t0)
        per_img = min(times) / n_inner / b
        print(f"{name}: {1.0 / per_img:.1f} img/s "
              f"({per_img * 1e3:.2f} ms/img, batch {b}, "
              f"times={[round(t * 1e3, 1) for t in times]} ms)", file=sys.stderr)
        return per_img

    per_img = {}
    which = args.annotator
    # "pass" = the reference annotation pass only (hed+seg+depth/normal),
    # skipping canny — informational-only for the composite, and its scan
    # program has been the repeat remote-compile-stall offender
    if which in ("canny", "all"):
        from prompt_diffusion_tpu.annotators.canny import canny

        n = 20  # cheap op: amortize dispatch over a scan of 20

        def run_canny(x):
            def body(c, i):
                e = canny(x * (1.0 + 1e-4 * i))
                return c + jnp.sum(e.astype(jnp.float32)), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

        per_img["canny"] = time_fn("canny", jax.jit(run_canny), n_inner=n)
    if which in ("hed", "all", "pass"):
        from prompt_diffusion_tpu.annotators.hed import HEDNetwork

        net = HEDNetwork(policy=pol)
        hp = fast_random_params_bf16(net, jax.random.PRNGKey(1), x0[:1])
        per_img["hed"] = time_fn(
            "hed", jax.jit(lambda x: jnp.sum(net.apply(hp, x))))
    if which in ("midas", "all", "pass"):
        # DPT-Hybrid — the reference's ecosystem-default MiDaS variant
        # (annotator/midas/api.py:30-46); one forward yields depth AND
        # normal, exactly the reference pass's _depth.jpg + _normal.jpg
        from prompt_diffusion_tpu.annotators.midas import (
            DPTHybridDepth, depth_to_normals)

        dpt = DPTHybridDepth(policy=pol)
        dp = fast_random_params_bf16(dpt, jax.random.PRNGKey(2),
                                     x0[:1] / 127.5 - 1.0)

        def run_midas(x):
            depth = dpt.apply(dp, x / 127.5 - 1.0)
            d01, normals = depth_to_normals(depth)
            return jnp.sum(d01) + jnp.sum(normals)

        per_img["midas"] = time_fn("midas-hybrid(depth+normal)",
                                   jax.jit(run_midas))
    if which in ("uniformer", "all", "pass"):
        from prompt_diffusion_tpu.annotators.uniformer import UniFormerSeg

        seg = UniFormerSeg(policy=pol)
        sp = fast_random_params_bf16(seg, jax.random.PRNGKey(3), x0[:1])
        per_img["uniformer"] = time_fn(
            "uniformer-seg",
            jax.jit(lambda x: jnp.sum(jnp.argmax(seg.apply(sp, x), -1))))

    if which in ("all", "pass"):
        # the reference pass runs hed + seg + depth/normal on every image
        pass_s = per_img["hed"] + per_img["uniformer"] + per_img["midas"]
        emit(
            f"images/sec/chip (batched annotation pass hed+seg+depth/normal "
            f"{size}px, batch {b}, random bf16 weights"
            f"{', int8 ViT mode' if args.int8 else ''})",
            1.0 / pass_s, "img/s", A100_ANNOTATE_IMGS_PER_SEC,
        )
    else:
        emit(
            f"images/sec/chip (batched {which} condition extraction "
            f"{size}px, batch {b})",
            1.0 / per_img[which], "img/s", A100_ANNOTATE_IMGS_PER_SEC,
        )


def bench_train(args):
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.training.sd15 import (
        SD15TrainConfig, init_train_state, make_optimizer, make_train_step)

    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15

    b = args.batch
    size = args.size
    # gradient checkpointing, as the reference's training configs enable
    # (models/cldm_v15.yaml:44,61) — without it batch 8 fp32 Adam at 512²
    # exceeds one chip's HBM
    cfg_remat = UNetConfig(use_checkpoint=True)
    pipe = PromptDiffusionSD15.create(
        unet=UNetSD15(config=cfg_remat),
        controlnet=ControlNetSD15(config=cfg_remat),
    )
    log("initializing params (jitted init)...")
    params = jax.jit(lambda r: pipe.init_params(r, image_size=size))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    cfg = SD15TrainConfig(accum_steps=1, use_ema=False)
    trainable = {"controlnet": params["controlnet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    # frozen nets need no fp32 master copies — bf16 storage halves their
    # 4.3 GB so params + Adam + remat activations fit one 16 GB chip
    from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

    frozen = jax.jit(cast_params_bf16)(
        {k: v for k, v in params.items() if k != "controlnet"})
    jax.block_until_ready(frozen)
    del params
    step = jax.jit(make_train_step(pipe, cfg, tx), donate_argnums=(0,))

    batch = {
        "image": jnp.zeros((b, size, size, 3), jnp.float32),
        "query": jnp.zeros((b, size, size, 3), jnp.float32),
        "example_pair": jnp.zeros((b, size, size, 6), jnp.float32),
        "token_ids": jnp.zeros((b, 77), jnp.int32),
        "null_ids": jnp.zeros((1, 77), jnp.int32),
    }
    log("compiling train step...")
    t0 = time.perf_counter()
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    float(jnp.sum(jnp.stack([jnp.asarray(v, jnp.float32).sum()
                             for v in jax.tree_util.tree_leaves(metrics)])))
    log(f"compiled in {time.perf_counter() - t0:.0f}s; timing")
    times = []
    for i in range(max(args.iters, 5)):
        t0 = time.perf_counter()
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2 + i))
        float(jnp.asarray(jax.tree_util.tree_leaves(metrics)[0], jnp.float32).sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    emit(
        f"train samples/sec/chip (SD1.5 ControlNet {size}px, batch {b})",
        b / best, "samples/s", A100_TRAIN_SAMPLES_PER_SEC / 8,  # per-GPU
    )
    print(f"step_ms={[round(t * 1e3, 1) for t in times]}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sd15",
                    choices=["sd15", "sd3", "annotate", "train"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--annotator", default="canny",
                    choices=["canny", "hed", "midas", "uniformer", "all",
                             "pass"],
                    help="annotate config: which net to bench (BASELINE 3; "
                         "'all' also emits the reference-pass "
                         "hed+seg+depth/normal number)")
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "plms", "unipc", "dpm++", "dpm"],
                    help="sd15 denoise loop (BASELINE config 2 = unipc)")
    ap.add_argument("--bf16-params", action="store_true",
                    help="cast weights to bf16 (halves weight HBM traffic)")
    ap.add_argument("--with-t5", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="sd3: run the real T5-XXL encoder on-chip (staged: "
                         "encode once, free weights, denoise) instead of "
                         "drop_t5 zero-padded slots. DEFAULT ON for sd3 — "
                         "T5 is the reference default "
                         "(promptdiffusioncontrolnetpipeline_sd3.py:351-543) "
                         "and costs only -1.2% (0.1567 vs 0.1586 int8, q4); "
                         "--no-with-t5 for the drop-T5 fallback")
    ap.add_argument("--int8", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="int8 W8A8 quantized serving mode for the UNet/"
                         "ControlNet/MMDiT hot loop (~1.7x MXU rate; see "
                         "ops/quant.py). DEFAULT ON for sd15/sd3: it is the "
                         "recorded serving mode — quality-validated on-chip "
                         "(FID drift 45-67x below the sampling-split floor, "
                         "docs/ROADMAP.md). --no-int8 for exact-bf16 numerics.")
    ap.add_argument("--int8-vae", action="store_true",
                    help="with --int8: also quantize the VAE's interior "
                         "convs (once-per-generate decode wall-clock lever; "
                         "quality evidence pending — not the default)")
    args = ap.parse_args()
    if args.int8 is None:
        args.int8 = args.config in ("sd15", "sd3")
    if args.with_t5 is None:
        args.with_t5 = args.config == "sd3"
    if args.int8_vae and not args.int8:
        ap.error("--int8-vae requires the int8 mode (drop --no-int8)")
    _check_backend_alive()
    {"sd15": bench_sd15, "sd3": bench_sd3,
     "annotate": bench_annotate, "train": bench_train}[args.config](args)


def _check_backend_alive(timeout_s: float = 180.0):
    """Fail fast (and diagnosably) when the TPU tunnel is down.

    During an outage `jax.devices()` hangs indefinitely (observed hours-
    long, 2026-08-17) — without this guard a driver-run bench stalls with
    no output instead of reporting the environment failure. Healthy init
    is a few seconds; 180 s is far past any observed healthy cold start."""
    import threading

    done = threading.Event()
    devs = []
    err = []

    def probe():
        try:
            import jax

            devs.extend(jax.devices())
        except BaseException as e:  # record fast failures — they are NOT a hang
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        log(f"FATAL: jax.devices() did not return within {timeout_s:.0f}s "
            "— TPU tunnel down? (no metric emitted)")
        sys.stderr.flush()
        # os._exit: the probe thread is wedged inside backend init and may
        # hold locks jax's atexit handlers need — a plain sys.exit can hang
        import os

        os._exit(3)
    if err:
        log(f"FATAL: backend init failed (not a hang): {err[0]!r} "
            "(no metric emitted)")
        sys.stderr.flush()
        import os

        os._exit(3)
    log(f"backend alive: {devs}")


if __name__ == "__main__":
    main()
