"""Prompt-Diffusion TPU: a TPU-native (JAX/Flax/Pallas/pjit) rebuild of
Prompt-Diffusion ("In-Context Learning Unlocked for Diffusion Models",
arXiv 2305.01115; reference implementation david3684/Prompt-Diffusion).

The framework provides, TPU-first:
  * SD1.5 latent-diffusion model zoo (UNet, dual-hint ControlNet, KL-VAE,
    CLIP text encoder) as Flax modules in NHWC layout.
  * SD3 (MMDiT) flow-matching variant with the example-pair ControlNet.
  * Pure-functional samplers (DDIM / UniPC / FlowMatchEuler) driven by
    `lax.scan` so an entire denoising loop compiles to one XLA program.
  * Pallas flash-attention kernels for the hot self/cross attention ops.
  * Data-parallel / FSDP training over a `jax.sharding.Mesh`.
  * Annotators (canny/HED/MiDaS/MLSD/openpose/UniFormer) as batched,
    jittable JAX ops.
  * Checkpoint import from both reference formats (ldm `.ckpt` and
    HF-diffusers folders).
"""

__version__ = "0.1.0"
