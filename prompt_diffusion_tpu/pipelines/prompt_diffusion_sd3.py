"""End-to-end SD3 Prompt-Diffusion inference pipeline (jitted).

TPU-native re-expression of `SD3PromptDiffusionPipeLine`
(promptdiffusioncontrolnetpipeline_sd3.py:855-1280):
  * triple text encoding — CLIP-L + CLIP-bigG (pooled+penultimate) and
    T5 (sequence), joined exactly like `encode_prompt` (:351-543):
    clip_seq = cat(clipL_hidden, clipG_hidden) padded to T5 width,
    joint = cat([clip_seq, t5_seq], axis=1) ; pooled = cat(pooledL, pooledG)
  * support pair → `encode_support_pair` (down_proj 6→3 → VAE encode with
    shift/scale, :1096-1115); query cond → VAE latent (:1118-1133)
  * FlowMatchEuler loop as ONE `lax.scan` (the reference's per-step
    `xm.mark_step()` at :1264-1265 becomes the scan boundary)
  * CFG double-batch (uncond ‖ cond), VAE decode with shift_factor.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.models.clip_text import CLIPTextModel
from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet, SupportPairDownProj
from prompt_diffusion_tpu.models.mmdit_sd3 import SD3Transformer
from prompt_diffusion_tpu.models.t5_text import T5Encoder
from prompt_diffusion_tpu.models.vae import AutoencoderKL, sample_from_moments
from prompt_diffusion_tpu.schedulers.flow_match import flow_match_step, make_inference_sigmas


@functools.lru_cache(maxsize=8)
def _jitted_t5_apply(t5: T5Encoder):
    """One compiled T5 program per encoder module (flax modules are
    hashable frozen dataclasses) — `encode_t5` must not re-trace the
    4.7B XXL encoder on every prompt."""
    return jax.jit(t5.apply)


@dataclasses.dataclass
class PromptDiffusionSD3:
    """Model bundle. Param dict keys:
    {"transformer","controlnet","down_proj","vae","clip_l","clip_g","t5"}."""

    transformer: SD3Transformer
    controlnet: SD3ControlNet
    down_proj: SupportPairDownProj
    vae: AutoencoderKL
    clip_l: CLIPTextModel
    clip_g: CLIPTextModel
    t5: Optional[T5Encoder]

    @classmethod
    def create(cls, transformer=None, controlnet=None, vae=None,
               clip_l=None, clip_g=None, t5=None, policy=None,
               vae_int8: bool = False):
        """`policy=` overrides the transformer/controlnet dtype policy (e.g.
        `int8_policy()` — W8A8 on the JointBlock projections/FFs, where SD3's
        arithmetic intensity makes int8 pay; VAE/text encoders keep defaults).
        `vae_int8=True` additionally quantizes the VAE's interior convs
        (the 1024² decode + support-pair encode; boundary convs stay bf16)."""
        from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig
        from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig
        from prompt_diffusion_tpu.models.vae import VAEConfig

        if policy is not None:
            transformer = transformer or SD3Transformer(policy=policy)
            controlnet = controlnet or SD3ControlNet(policy=policy)
        sd3_vae = VAEConfig(z_channels=16, scale_factor=1.5305, shift_factor=0.0609)
        if vae_int8:
            from prompt_diffusion_tpu.utils.dtypes import int8_policy

            vae = vae or AutoencoderKL(config=sd3_vae, policy=int8_policy())
        return cls(
            transformer=transformer or SD3Transformer(),
            controlnet=controlnet or SD3ControlNet(),
            down_proj=SupportPairDownProj(),
            vae=vae or AutoencoderKL(config=sd3_vae),
            clip_l=clip_l or CLIPTextModel(),
            clip_g=clip_g
            or CLIPTextModel(
                config=CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                                      intermediate_size=5120, activation="gelu")
            ),
            t5=t5,  # None → zero-padded T5 slots (drop_t5 mode)
        )

    # ---- text encoding ---------------------------------------------------

    def encode_prompt(self, params, ids_l, ids_g, ids_t5=None, t5_len: int = 256,
                      t5_seq=None):
        """Returns (joint_seq (B, 77+L_t5, joint_dim), pooled (B, 2048)).

        `t5_seq` — precomputed T5 hidden states (B, L, joint_dim): the
        staged-T5 path for chips whose HBM cannot co-resident T5-XXL with
        the denoise graph (encode once via `encode_t5`, free the T5
        weights, feed the cached sequence — also the natural serving-side
        T5-embedding cache). Takes precedence over `ids_t5`."""
        joint_dim = self.transformer.config.joint_attention_dim
        out_l = self.clip_l.apply(params["clip_l"], ids_l, output_hidden_layer=2)
        out_g = self.clip_g.apply(params["clip_g"], ids_g, output_hidden_layer=2)
        clip_seq = jnp.concatenate([out_l["hidden"], out_g["hidden"]], axis=-1)
        pad = joint_dim - clip_seq.shape[-1]
        clip_seq = jnp.pad(clip_seq, ((0, 0), (0, 0), (0, pad)))
        pooled = jnp.concatenate([out_l["pooled"], out_g["pooled"]], axis=-1)
        if t5_seq is not None:
            t5_seq = t5_seq.astype(jnp.float32)
        elif self.t5 is not None and ids_t5 is not None:
            t5_seq = self.t5.apply(params["t5"], ids_t5)
        else:
            t5_seq = jnp.zeros((ids_l.shape[0], t5_len, joint_dim), jnp.float32)
        return jnp.concatenate([clip_seq, t5_seq], axis=1), pooled

    @staticmethod
    def encode_t5(t5: T5Encoder, t5_params, ids_t5):
        """Standalone jitted T5 forward for the staged path (reference
        triple-encode `encode_prompt` :351-543 runs T5 in the same process;
        on a 16 GB chip the XXL weights are loaded, run once per prompt,
        and freed before the denoise program). The jitted program is
        cached per encoder module so repeated per-prompt calls reuse one
        compilation."""
        return _jitted_t5_apply(t5)(t5_params, ids_t5)

    # ---- VAE helpers -----------------------------------------------------

    def _encode_vae(self, params, images, rng):
        moments = self.vae.apply(params["vae"], images, method=AutoencoderKL.encode_moments)
        z = sample_from_moments(moments, rng)
        return (z - self.vae.config.shift_factor) * self.vae.config.scale_factor

    def encode_support_pair(self, params, cond, gt, rng):
        """down_proj(cond‖gt) → VAE encode → shift/scale latents
        (promptdiffusioncontrolnet_sd3.py:189-198 + pipeline :1096-1115)."""
        mixed = self.down_proj.apply(params["down_proj"], cond, gt)
        return self._encode_vae(params, mixed, rng)

    def decode_latents(self, params, latents):
        z = latents / self.vae.config.scale_factor + self.vae.config.shift_factor
        img = self.vae.apply(params["vae"], z, method=AutoencoderKL.decode)
        # reference custom postprocess maps the 0-1-trained output (:805-851)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    # ---- generation ------------------------------------------------------

    def generate(
        self,
        params,
        rng: jax.Array,
        prompt_ids,  # dict(l=(B,77), g=(B,77), t5=(B,L) or None)
        neg_prompt_ids,
        control_image: jnp.ndarray,  # (B,H,W,3) query condition, [-1,1]
        support_cond: jnp.ndarray,  # (B,H,W,3) support condition, [-1,1]
        support_image: jnp.ndarray,  # (B,H,W,3) support image, [-1,1]
        num_steps: int = 28,
        guidance_scale: float = 7.0,
        controlnet_conditioning_scale: float = 1.0,
        shift: float = 3.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        init_noise=None,
        t5_seq=None,      # precomputed T5 states for the cond prompt
        neg_t5_seq=None,  # ... and the uncond prompt (staged-T5 path)
    ) -> jnp.ndarray:
        from prompt_diffusion_tpu.pipelines.control_window import (
            control_keep, is_default_window, validate_window)

        validate_window(control_guidance_start, control_guidance_end)
        windowed = not is_default_window(control_guidance_start, control_guidance_end)
        b, img_h, img_w, _ = control_image.shape
        lat_h, lat_w = img_h // 8, img_w // 8
        zc = self.vae.config.z_channels

        ctx_c, pool_c = self.encode_prompt(
            params, prompt_ids["l"], prompt_ids["g"], prompt_ids.get("t5"),
            t5_seq=t5_seq,
        )
        ctx_u, pool_u = self.encode_prompt(
            params, neg_prompt_ids["l"], neg_prompt_ids["g"], neg_prompt_ids.get("t5"),
            t5_seq=neg_t5_seq,
        )
        context2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
        pooled2 = jnp.concatenate([pool_u, pool_c], axis=0)

        rng, r_pair, r_cond, r_noise = jax.random.split(rng, 4)
        pair_lat = self.encode_support_pair(params, support_cond, support_image, r_pair)
        cond_lat = self._encode_vae(params, control_image, r_cond)
        pair2 = jnp.concatenate([pair_lat] * 2, axis=0)
        cond2 = jnp.concatenate([cond_lat] * 2, axis=0)

        timesteps_np, sigmas_np = make_inference_sigmas(num_steps, shift=shift)
        timesteps = jnp.asarray(timesteps_np, jnp.float32)
        sigmas = jnp.asarray(sigmas_np, jnp.float32)

        if init_noise is None:
            x = jax.random.normal(r_noise, (b, lat_h, lat_w, zc), dtype=jnp.float32)
        else:
            # caller-supplied x_T — per-request determinism in the serving
            # batcher (same contract as the SD1.5 pipeline)
            x = init_noise.astype(jnp.float32)

        def body(x, i):
            t2 = jnp.full((2 * b,), timesteps[i], dtype=jnp.float32)
            x2 = jnp.concatenate([x] * 2, axis=0)
            cond_scale = controlnet_conditioning_scale
            if windowed:
                # reference controlnet_keep[i] × conditioning_scale
                # (promptdiffusioncontrolnetpipeline_sd3.py:1156-1162,1208)
                cond_scale = cond_scale * control_keep(
                    i, num_steps, control_guidance_start, control_guidance_end)
            control = self.controlnet.apply(
                params["controlnet"], x2, t2, cond2, pair2, context2, pooled2,
                conditioning_scale=cond_scale,
            )
            v2 = self.transformer.apply(
                params["transformer"], x2, t2, context2, pooled2,
                block_controlnet_hidden_states=control,
            )
            v_u, v_c = jnp.split(v2, 2, axis=0)
            v = v_u + guidance_scale * (v_c - v_u)
            return flow_match_step(x, v, sigmas[i], sigmas[i + 1]), None

        x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
        return self.decode_latents(params, x)

    def jit_generate(self):
        # guidance/conditioning scales are traced — changing them must not
        # recompile; num_steps shapes the scan and shift feeds the host-side
        # sigma table, so those stay static.
        return jax.jit(
            self.generate,
            static_argnames=("num_steps", "shift"),
        )

    # ---- init -------------------------------------------------------------

    def init_params(self, rng: jax.Array, image_size: int = 1024, batch: int = 1,
                    t5_len: int = 256):
        """Random-init parameter dict (for training-from-scratch / benches)."""
        h = w = image_size
        lh, lw = h // 8, w // 8
        zc = self.vae.config.z_channels
        r1, r2, r3, r4, r5, r6, r7 = jax.random.split(rng, 7)
        lat = jnp.zeros((batch, lh, lw, zc))
        t = jnp.zeros((batch,), jnp.float32)
        joint = self.transformer.config.joint_attention_dim
        ctx = jnp.zeros((batch, 77 + t5_len, joint))
        pooled = jnp.zeros((batch, 2048))
        ids = jnp.zeros((batch, 77), jnp.int32)
        img = jnp.zeros((batch, h, w, 3))
        params = {
            "transformer": self.transformer.init(r1, lat, t, ctx, pooled),
            "controlnet": self.controlnet.init(r2, lat, t, lat, lat, ctx, pooled),
            "down_proj": self.down_proj.init(r3, img, img),
            "vae": self.vae.init(r4, img),
            "clip_l": self.clip_l.init(r5, ids),
            "clip_g": self.clip_g.init(r6, ids),
        }
        if self.t5 is not None:
            params["t5"] = self.t5.init(r7, jnp.zeros((batch, t5_len), jnp.int32))
        return params
