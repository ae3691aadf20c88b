"""Production serving: continuous micro-batching around the jitted
SD1.5 Prompt-Diffusion pipeline.

The reference serves one request at a time from a notebook / gradio-style
loop (run_prompt_diffusion.ipynb cell 5 `process`). On TPU the economics
are different: a single jitted program at batch B has ~the same latency as
batch 1 until the MXU saturates, so the server batches concurrent requests
into fixed-size buckets and runs them as ONE program execution.

Design (TPU-first):
  * requests carry traced-only parameters (guidance/control scale, PRNG
    key) — they batch freely; shape-affecting parameters (steps, size,
    eta, guess_mode) pick the bucket, so each distinct sampler config
    compiles exactly once and is cached by jit thereafter.
  * batch buckets are powers of two up to `max_batch`; a partial bucket is
    padded by repeating the last request (per-sample independence makes
    padding exact) and sliced on the way out.
  * one worker thread owns the device; the queue decouples producers.
    `flush_ms` bounds the extra latency a request pays to let a batch
    form under load.

No counterpart file in the reference (capability superset); closest
behavior: run_prompt_diffusion.ipynb cell 5 + generate_train.py:99-121
fixed-batch loops.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence, Tuple


class ServerStopped(RuntimeError):
    """Raised into futures still outstanding when the server shuts down."""

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GenerationRequest:
    """One generation job. Arrays are host-side numpy in pipeline layout."""

    token_ids: np.ndarray  # (77,) int32
    neg_token_ids: np.ndarray  # (77,) int32
    example_pair: np.ndarray  # (H, W, 6) float32 in [-1, 1]
    query: np.ndarray  # (H, W, 3) float32 in [-1, 1]
    num_steps: int = 50
    guidance_scale: float = 9.0
    control_scale: float = 1.0
    eta: float = 0.0
    guess_mode: bool = False
    sampler: str = "ddim"  # "ddim" | "plms" | "unipc" | "dpm++" | "dpm"
    seed: int = 0

    def bucket_key(self):
        """Everything shape- or compile-affecting."""
        h, w, _ = self.query.shape
        return (h, w, self.num_steps, self.eta, self.guess_mode, self.sampler)


@dataclasses.dataclass
class SD3GenerationRequest:
    """One SD3 Prompt-Diffusion job (1024² MMDiT stack)."""

    token_ids_l: np.ndarray  # (77,) int32 CLIP-L ids
    token_ids_g: np.ndarray  # (77,) int32 CLIP-G ids
    neg_ids_l: np.ndarray
    neg_ids_g: np.ndarray
    support_cond: np.ndarray  # (H, W, 3) [-1, 1]
    support_image: np.ndarray  # (H, W, 3) [-1, 1]
    query: np.ndarray  # (H, W, 3) [-1, 1]
    t5_ids: Optional[np.ndarray] = None  # (L,) int32, requires pipe.t5
    num_steps: int = 28
    guidance_scale: float = 7.0
    control_scale: float = 1.0
    shift: float = 3.0
    seed: int = 0

    def bucket_key(self):
        h, w, _ = self.query.shape
        # control_scale is applied on token-space residual tuples inside
        # the controlnet — kept per-bucket (unlike guidance, which batches
        # per-sample through the CFG combine)
        return (h, w, self.num_steps, self.shift, self.control_scale,
                self.t5_ids is not None)


@dataclasses.dataclass
class ServerConfig:
    max_batch: int = 8
    flush_ms: float = 10.0
    queue_size: int = 256
    # Allowed compiled batch shapes. None = powers of two up to max_batch.
    # A deployment that only ever sees full batches can list exactly those
    # (e.g. (1, 8)) and pay that many bucket compiles — partial flushes are
    # padded up to the next allowed bucket.
    buckets: Optional[Tuple[int, ...]] = None


class GenerationServer:
    """Micro-batching server over `PromptDiffusionSD15.jit_generate`.

    Usage:
        server = GenerationServer(pipe, params)
        server.start()
        fut = server.submit(request)      # returns concurrent.futures.Future
        image = fut.result()              # (H, W, 3) float32 in [0, 1]
    """

    def __init__(self, pipe, params, config: Optional[ServerConfig] = None,
                 adapter: Optional["PipelineAdapter"] = None):
        self.pipe = pipe
        self.params = params
        self.config = config or ServerConfig()
        if self.config.buckets:
            self._buckets = sorted(set(int(b) for b in self.config.buckets))
            if self._buckets[0] < 1:
                raise ValueError(f"bucket sizes must be >= 1: {self.config.buckets}")
        else:
            self._buckets, b = [], 1
            while b <= self.config.max_batch:
                self._buckets.append(b)
                b *= 2
        self._adapter = adapter or SD15Adapter(pipe)
        self._queue: "queue.Queue" = queue.Queue(self.config.queue_size)
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        # serializes submit() against stop()'s queue drain: without it a
        # concurrently submitted request can land in the consumerless queue
        # AFTER the drain and its fut.result() would hang forever
        self._lifecycle = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "padded_slots": 0}

    # ---- lifecycle --------------------------------------------------------

    def start(self):
        with self._lifecycle:
            if self._worker is not None:
                return self
            self._stop.clear()
            self._worker = threading.Thread(target=self._run, daemon=True)
            self._worker.start()
        return self

    def stop(self, timeout: float = 30.0):
        self._stop.set()
        worker = self._worker
        if worker is not None:
            worker.join(timeout)
        with self._lifecycle:
            if worker is not None and worker.is_alive():
                # join timed out (e.g. a minutes-long cold compile): keep
                # the handle so a later start() cannot spawn a duplicate
                # worker; the zombie exits after its current batch and
                # fails its own pending map (stop flag stays set)
                pass
            else:
                self._worker = None
            # the worker fails its own pending dict on exit; anything that
            # raced into the queue after that is failed here so no
            # fut.result() ever hangs past shutdown (submit() re-drains
            # after a post-stop put for the same guarantee)
            self._fail_queued()

    def _fail_queued(self):
        """Drain the queue, failing every undone future. Caller holds
        self._lifecycle. Idempotent."""
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                return
            if not fut.done():
                fut.set_exception(ServerStopped("server stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ---- client API -------------------------------------------------------

    def submit(self, req: GenerationRequest) -> Future:
        fut: Future = Future()
        # bounded-queue backpressure OUTSIDE the lifecycle lock: a submit
        # blocked on a full queue must not prevent start()/stop() from
        # taking the lock — the worker those calls manage is the only
        # thing that can drain the queue. Re-check the stop flag each wait
        # slice so a full queue with no consumer cannot deadlock shutdown.
        while True:
            if self._stop.is_set():
                fut.set_exception(ServerStopped("server stopped"))
                return fut
            try:
                self._queue.put((req, fut), timeout=0.1)
                break
            except queue.Full:
                continue
        if self._stop.is_set():
            # raced with stop(): its drain may have finished before our put
            # landed. Re-drain under the lock (idempotent) so no queued
            # fut.result() ever hangs past shutdown.
            with self._lifecycle:
                self._fail_queued()
        return fut

    def generate(self, req: GenerationRequest, timeout: Optional[float] = None):
        return self.submit(req).result(timeout)

    def warmup(self, sample: GenerationRequest, batches: Sequence[int] = ()):
        """Pre-compile the buckets a deployment will serve (first compile
        of a 512² program is minutes on a cold cache — do it before
        accepting traffic)."""
        sizes = list(batches) or list(self._buckets)
        for b in sizes:
            self._execute([sample] * b)

    # ---- worker -----------------------------------------------------------

    def _bucket_size(self, n: int) -> int:
        """Smallest allowed bucket that holds n requests (the batch
        collector never exceeds the largest allowed bucket)."""
        for b in self._buckets:
            if b >= n:
                return b
        return self._buckets[-1]

    @staticmethod
    def _batch_limit(req, max_batch: int) -> int:
        # eta>0 draws batch-shaped per-step DDIM noise inside the loop;
        # only a 1-request batch keeps the per-request determinism
        # contract (image depends on the request's seed alone)
        if getattr(req, "eta", 0.0) > 0:
            return 1
        return max_batch

    def _absorb(self, timeout: float) -> bool:
        """Move one queued item into the per-bucket pending map."""
        try:
            item = self._queue.get(timeout=timeout)
        except queue.Empty:
            return False
        self._pending.setdefault(
            item[0].bucket_key(), collections.deque()).append(item)
        return True

    def _run(self):
        cfg = self.config
        # per-bucket pending map instead of tail re-queueing: within a
        # bucket requests are FIFO, and buckets are served round-robin
        # (move_to_end after each batch) so sustained traffic to one
        # bucket cannot starve another — every bucket's head waits at
        # most one batch per competing bucket
        self._pending = collections.OrderedDict()
        while not self._stop.is_set():
            if not self._pending and not self._absorb(0.05):
                continue
            key = next(iter(self._pending))
            dq = self._pending[key]
            self._pending.move_to_end(key)  # round-robin rotation
            limit = self._batch_limit(dq[0][0], min(cfg.max_batch, self._buckets[-1]))
            deadline = time.perf_counter() + cfg.flush_ms / 1e3
            while len(dq) < limit:
                remaining = deadline - time.perf_counter()
                if remaining <= 0 or not self._absorb(remaining):
                    break
            batch = [dq.popleft() for _ in range(min(len(dq), limit))]
            if not dq:
                del self._pending[key]
            reqs = [r for r, _ in batch]
            futs = [f for _, f in batch]
            try:
                images = self._execute(reqs)
                for f, img in zip(futs, images):
                    f.set_result(img)
            except Exception as e:  # surface compile/runtime errors per-future
                for f in futs:
                    if not f.done():
                        f.set_exception(e)
        for dq in self._pending.values():
            for _, fut in dq:
                if not fut.done():
                    fut.set_exception(ServerStopped("server stopped"))
        self._pending.clear()

    def _execute(self, reqs: Sequence) -> np.ndarray:
        n = len(reqs)
        bucket = self._bucket_size(n)
        padded = reqs + [reqs[-1]] * (bucket - n)
        images = self._adapter.execute(self.params, padded)
        out = np.asarray(images[:n])
        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["padded_slots"] += bucket - n
        return out


class PipelineAdapter:
    """Builds batched arrays from padded same-bucket requests and runs the
    jitted pipeline once."""

    def execute(self, params, padded):  # pragma: no cover - interface
        raise NotImplementedError


class SD15Adapter(PipelineAdapter):
    def __init__(self, pipe):
        self._gen = pipe.jit_generate()

    def execute(self, params, padded):
        r0 = padded[0]
        ids = jnp.asarray(np.stack([r.token_ids for r in padded]), jnp.int32)
        neg = jnp.asarray(np.stack([r.neg_token_ids for r in padded]), jnp.int32)
        pair = jnp.asarray(np.stack([r.example_pair for r in padded]), jnp.float32)
        qry = jnp.asarray(np.stack([r.query for r in padded]), jnp.float32)
        # per-request traced scales: guidance folds into the CFG combine and
        # control into the tap scaling — batch-shaped so requests with
        # different scales share one execution.
        guidance = jnp.asarray(
            [r.guidance_scale for r in padded], jnp.float32)[:, None, None, None]
        control = jnp.asarray(
            [r.control_scale for r in padded], jnp.float32)[:, None, None, None]
        # per-request deterministic x_T: each request's noise depends only
        # on its own seed, never on batch composition
        h, w, _ = r0.query.shape
        seeds = jnp.asarray([r.seed for r in padded], jnp.uint32)
        noise = jax.vmap(
            lambda s: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(0), s),
                (h // 8, w // 8, 4), jnp.float32)
        )(seeds)

        # eta>0 buckets are served at batch 1 (see _batch_limit), so the
        # loop rng may be derived from the request's own seed — the
        # stochastic DDIM noise is then seed-deterministic; for eta==0 the
        # loop rng is unused and a constant key keeps programs cacheable
        loop_rng = (
            jax.random.fold_in(jax.random.PRNGKey(1), np.uint32(r0.seed))
            if r0.eta > 0 else jax.random.PRNGKey(0))
        return self._gen(
            params, loop_rng, ids, neg, pair, qry,
            num_steps=r0.num_steps,
            guidance_scale=guidance,
            control_scale=control,
            eta=r0.eta,
            guess_mode=r0.guess_mode,
            init_noise=noise,
            sampler=getattr(r0, "sampler", "ddim"),
        )


class SD3Adapter(PipelineAdapter):
    """SD3 MMDiT stack: per-sample traced guidance + seed-deterministic
    x_T; control_scale and shift split buckets (token-space residual
    scaling is per-bucket)."""

    def __init__(self, pipe):
        self.pipe = pipe
        self._gen = pipe.jit_generate()

    def execute(self, params, padded):
        r0 = padded[0]
        st = lambda field, dt: jnp.asarray(
            np.stack([getattr(r, field) for r in padded]), dt)
        pd = {"l": st("token_ids_l", jnp.int32), "g": st("token_ids_g", jnp.int32)}
        nd = {"l": st("neg_ids_l", jnp.int32), "g": st("neg_ids_g", jnp.int32)}
        if r0.t5_ids is not None:
            pd["t5"] = st("t5_ids", jnp.int32)
            nd["t5"] = jnp.zeros_like(pd["t5"])
        guidance = jnp.asarray(
            [r.guidance_scale for r in padded], jnp.float32)[:, None, None, None]
        h, w, _ = r0.query.shape
        zc = self.pipe.vae.config.z_channels
        seeds = jnp.asarray([r.seed for r in padded], jnp.uint32)
        noise = jax.vmap(
            lambda s: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(0), s),
                (h // 8, w // 8, zc), jnp.float32)
        )(seeds)
        return self._gen(
            params, jax.random.PRNGKey(0), pd, nd,
            st("query", jnp.float32), st("support_cond", jnp.float32),
            st("support_image", jnp.float32),
            num_steps=r0.num_steps,
            guidance_scale=guidance,
            controlnet_conditioning_scale=r0.control_scale,
            shift=r0.shift,
            init_noise=noise,
        )
