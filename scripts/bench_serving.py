"""Serving throughput/latency under concurrent load (VERDICT r2 #8).

Drives `serving/server.py` on the real chip with the FULL pipeline
(random init — perf is weight-independent) and measures req/s +
p50/p99 latency at concurrent closed-loop clients, proving (or
refuting) the micro-batching thesis against the serial batch-1 baseline.

  python scripts/bench_serving.py --steps 50 --max-batch 8 --reqs 6
  python scripts/bench_serving.py --stack sd3 --int8 --reqs 3

SD3 defaults (1024², 28-step FM-Euler, max_batch 2, clients 1,2,4)
reflect the measured saturation point: the MXU is full at the CFG double
batch already (docs/ROADMAP.md batch sweep), so SD3 micro-batching is a
queue-fairness feature more than a throughput one — this script measures
which.
"""

from __future__ import annotations

import argparse
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

_T0 = time.perf_counter()


def log(m):
    print(f"[serve +{time.perf_counter() - _T0:.0f}s] {m}", file=sys.stderr, flush=True)


def build_sd15(args):
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.serving.server import (
        GenerationRequest,
        GenerationServer,
        ServerConfig,
    )

    if args.int8:
        from prompt_diffusion_tpu.utils.dtypes import int8_policy

        pipe = PromptDiffusionSD15.create(policy=int8_policy())
    else:
        pipe = PromptDiffusionSD15.create()
    log("init params...")
    params = jax.jit(lambda r: pipe.init_params(r, image_size=args.size))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    proto = dict(
        token_ids=rng.integers(0, 100, (77,)).astype(np.int32),
        neg_token_ids=np.zeros((77,), np.int32),
        example_pair=rng.uniform(-1, 1, (args.size, args.size, 6)).astype(np.float32),
        query=rng.uniform(-1, 1, (args.size, args.size, 3)).astype(np.float32),
        num_steps=args.steps,
    )
    server = GenerationServer(
        pipe, params,
        ServerConfig(max_batch=args.max_batch, flush_ms=args.flush_ms,
                     buckets=args.bucket_list))
    return server, lambda seed: GenerationRequest(**proto, seed=seed)


def build_sd3(args):
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3
    from prompt_diffusion_tpu.serving.server import (
        GenerationServer,
        SD3Adapter,
        SD3GenerationRequest,
        ServerConfig,
    )
    from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

    if args.int8:
        from prompt_diffusion_tpu.utils.dtypes import int8_policy

        pipe = PromptDiffusionSD3.create(policy=int8_policy())
    else:
        pipe = PromptDiffusionSD3.create()  # drop_t5 mode
    log("init SD3 params (bf16 weights — reference serves SD3 in fp16)...")
    params = jax.jit(
        lambda r: cast_params_bf16(pipe.init_params(r, image_size=args.size, batch=1))
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    img = lambda: rng.uniform(-1, 1, (args.size, args.size, 3)).astype(np.float32)
    proto = dict(
        token_ids_l=rng.integers(0, 100, (77,)).astype(np.int32),
        token_ids_g=rng.integers(0, 100, (77,)).astype(np.int32),
        neg_ids_l=np.zeros((77,), np.int32),
        neg_ids_g=np.zeros((77,), np.int32),
        support_cond=img(), support_image=img(), query=img(),
        num_steps=args.steps,
    )
    server = GenerationServer(
        pipe, params,
        ServerConfig(max_batch=args.max_batch, flush_ms=args.flush_ms,
                     buckets=args.bucket_list),
        adapter=SD3Adapter(pipe))
    return server, lambda seed: SD3GenerationRequest(**proto, seed=seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", choices=["sd15", "sd3"], default="sd15")
    ap.add_argument("--int8", action="store_true",
                    help="serve the int8 W8A8 mode (the recorded serving config)")
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--max-batch", type=int, default=None)
    ap.add_argument("--reqs", type=int, default=6, help="requests per client")
    ap.add_argument("--clients", default=None)
    ap.add_argument("--flush-ms", type=float, default=50.0)
    ap.add_argument("--buckets", default=None,
                    help="comma list of compiled batch buckets to warm AND "
                         "serve (partial flushes pad up to the next allowed "
                         "bucket). Default: powers of 2 up to --max-batch. "
                         "Trimming this to the buckets a measurement "
                         "exercises cuts warmup from one compile per power "
                         "of 2 to one per listed bucket (VERDICT r4 weak #5)")
    args = ap.parse_args()

    sd3 = args.stack == "sd3"
    args.size = args.size or (1024 if sd3 else 512)
    args.steps = args.steps or (28 if sd3 else 50)
    args.max_batch = args.max_batch or (2 if sd3 else 8)
    args.clients = args.clients or ("1,2,4" if sd3 else "1,4,8,16")
    args.bucket_list = (tuple(int(x) for x in args.buckets.split(","))
                        if args.buckets else None)

    server, make_req = (build_sd3 if sd3 else build_sd15)(args)

    buckets = list(server._buckets)  # the allowed compiled shapes
    log(f"warming buckets {buckets} (one compile each — minutes per bucket)...")
    for b in buckets:
        t0 = time.perf_counter()
        server.warmup(make_req(0), batches=[b])
        log(f"bucket {b} compiled+run in {time.perf_counter() - t0:.0f}s")
    server.start()

    print(f"| clients | reqs | wall s | req/s | p50 s | p99 s | batches | pad |")
    print(f"|---|---|---|---|---|---|---|---|")
    for c in [int(x) for x in args.clients.split(",")]:
        lat = []
        lock = threading.Lock()
        server.stats.update({"requests": 0, "batches": 0, "padded_slots": 0})

        def client(cid):
            for r in range(args.reqs):
                req = make_req(cid * 1000 + r)
                t0 = time.perf_counter()
                img = server.generate(req, timeout=600)
                dt = time.perf_counter() - t0
                assert np.isfinite(img).all()
                with lock:
                    lat.append(dt)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,)) for i in range(c)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat = np.asarray(lat)
        n = len(lat)
        print(f"| {c} | {n} | {wall:.1f} | {n / wall:.3f} | "
              f"{np.percentile(lat, 50):.2f} | {np.percentile(lat, 99):.2f} | "
              f"{server.stats['batches']} | {server.stats['padded_slots']} |",
              flush=True)
    server.stop()


if __name__ == "__main__":
    main()
