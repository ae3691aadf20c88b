"""Verify-recipe library e2e: tiny-config pipeline on the real chip,
batch 2, bf16 + int8 serving policies (the int8 run exercises the new
Pallas conv routing end-to-end through the public API)."""
import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
from prompt_diffusion_tpu.utils.dtypes import default_policy, int8_policy

ucfg = UNetConfig(model_channels=64, channel_mult=(1, 2), num_res_blocks=1,
                  attention_resolutions=(1,), num_heads=4, context_dim=128)

for tag, pol in [("bf16", default_policy()), ("int8", int8_policy())]:
    pipe = PromptDiffusionSD15(
        unet=UNetSD15(config=ucfg, policy=pol),
        controlnet=ControlNetSD15(config=ucfg, hint_channels=6, policy=pol),
        vae=AutoencoderKL(config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2),
                                           num_res_blocks=1)),
        text_encoder=CLIPTextModel(
            config=CLIPTextConfig(vocab_size=100, hidden_size=64, num_layers=2,
                                  num_heads=4, intermediate_size=128)),
        schedule=DiffusionSchedule.create(),
    )
    params = jax.jit(lambda r: pipe.init_params(r, image_size=64))(
        jax.random.PRNGKey(0))
    b, s = 2, 64
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (b, 77)), jnp.int32)
    neg = jnp.zeros_like(ids)
    pair = jnp.zeros((b, s, s, 6), jnp.float32)
    query = jnp.zeros((b, s, s, 3), jnp.float32)
    gen = pipe.jit_generate()
    out = gen(params, jax.random.PRNGKey(1), ids, neg, pair, query,
              num_steps=8, guidance_scale=7.5)
    out2 = gen(params, jax.random.PRNGKey(1), ids, neg, pair, query,
               num_steps=8, guidance_scale=7.5)
    a = np.asarray(out, np.float32)
    assert a.shape == (b, s, s, 3), a.shape
    assert np.isfinite(a).all(), "non-finite pixels"
    assert 0.0 <= a.min() and a.max() <= 1.0, (a.min(), a.max())
    assert np.array_equal(a, np.asarray(out2, np.float32)), "nondeterministic"
    Image.fromarray((a[0] * 255).astype(np.uint8)).save(f"/tmp/e2e_{tag}.png")
    print(f"{tag}: OK shape={a.shape} range=[{a.min():.3f},{a.max():.3f}] "
          f"backend={jax.default_backend()}")
print("E2E DRIVE OK")
