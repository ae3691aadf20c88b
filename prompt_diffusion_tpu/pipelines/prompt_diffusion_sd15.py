"""End-to-end SD1.5 Prompt-Diffusion inference pipeline (jitted).

TPU-native fusion of the reference's two inference stacks:
  * the notebook flow — run_prompt_diffusion.ipynb cell 5 `process`:
    cond/un_cond dicts, control_scales = strength (or guess-mode decay
    0.825^(12−i)), DDIMSampler.sample with CFG scale;
  * PromptDiffusionPipeline.__call__ (pipeline_prompt_diffusion.py:890-1319):
    encode_prompt, prepare_image, denoise loop, VAE decode.

Everything from text-encoding to VAE decode compiles into ONE XLA program;
the S-step denoise loop is a `lax.scan` (no per-step dispatch), CFG runs
as a 2B double-batch exactly like the reference
(ddim_hacked.py:186-193 — uncond first, cond second).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.models.clip_text import CLIPTextModel
from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
from prompt_diffusion_tpu.models.unet_sd15 import UNetSD15
from prompt_diffusion_tpu.models.vae import AutoencoderKL
from prompt_diffusion_tpu.schedulers.ddim import DDIMTables, ddim_sample_loop
from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule


@dataclasses.dataclass
class PromptDiffusionSD15:
    """Bundles the four Flax models + schedule; holds no parameters.

    Parameters travel as a dict {"unet","controlnet","vae","clip"} so the
    pipeline composes with pjit shardings and checkpoint tooling.
    """

    unet: UNetSD15
    controlnet: ControlNetSD15
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    schedule: DiffusionSchedule

    @classmethod
    def create(cls, unet=None, controlnet=None, vae=None, text_encoder=None, schedule=None,
               policy=None, vae_int8: bool = False):
        """`policy=` overrides the UNet/ControlNet dtype policy (e.g.
        `int8_policy()` for the quantized serving mode); VAE and CLIP keep
        their bf16/fp32 defaults — they are not on the denoise hot loop.
        `vae_int8=True` additionally quantizes the VAE's interior convs
        (the once-per-generate decode; boundary convs stay bf16)."""
        if policy is not None:
            unet = unet or UNetSD15(policy=policy)
            controlnet = controlnet or ControlNetSD15(policy=policy)
        if vae_int8:
            from prompt_diffusion_tpu.utils.dtypes import int8_policy

            vae = vae or AutoencoderKL(policy=int8_policy())
        return cls(
            unet=unet or UNetSD15(),
            controlnet=controlnet or ControlNetSD15(),
            vae=vae or AutoencoderKL(),
            text_encoder=text_encoder or CLIPTextModel(),
            schedule=schedule
            or DiffusionSchedule.create(
                schedule="linear", timesteps=1000, linear_start=0.00085, linear_end=0.0120
            ),
        )

    # ---- loaders (reference pipeline mixin counterparts,
    # pipeline_prompt_diffusion.py:145,155-156) -----------------------------

    @classmethod
    def from_single_file(cls, path: str, **import_kwargs):
        """(pipe, params) from a reference-format `.ckpt`/`.safetensors`
        (FromSingleFileMixin counterpart). Delegates to
        tools.loaders.from_single_file — single source of truth."""
        from prompt_diffusion_tpu.tools.loaders import from_single_file

        return from_single_file(path, **import_kwargs)

    def load_lora_weights(self, params, path_or_sd, scale: float = 1.0) -> dict:
        """New param dict with a diffusers-format LoRA folded in
        (LoraLoaderMixin counterpart; trace-time fold — no recompile)."""
        from prompt_diffusion_tpu.tools.loaders import load_lora_weights

        return load_lora_weights(
            params, path_or_sd, scale=scale, unet_cfg=self.unet.config,
            clip_layers=self.text_encoder.config.num_layers)

    def load_textual_inversion(self, params, tokenizer, path_or_sd, token=None):
        """(new_pipe, new_params, token, ids): learned embeddings appended
        to the CLIP token table, placeholder registered with the tokenizer,
        and a pipeline whose text-encoder config reflects the grown vocab
        (flax validates param shapes at apply time, so the module's
        vocab_size must track the table). TextualInversionLoaderMixin
        counterpart."""
        from prompt_diffusion_tpu.tools.loaders import load_textual_inversion

        new_params, token, ids = load_textual_inversion(
            params, tokenizer, path_or_sd, token=token)
        n_new = new_params["clip"]["params"]["token_embedding"]["embedding"].shape[0]
        te = dataclasses.replace(
            self.text_encoder,
            config=dataclasses.replace(self.text_encoder.config, vocab_size=n_new))
        return dataclasses.replace(self, text_encoder=te), new_params, token, ids

    # ---- pieces -----------------------------------------------------------

    def encode_prompt(self, params, token_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text_encoder.apply(params["clip"], token_ids)["last_hidden_state"]

    def encode_long_prompt(self, params, token_ids: jnp.ndarray, windows: int = 3,
                           clip_skip: int = 0) -> jnp.ndarray:
        """Long-prompt encoding via 77-token windowing (cldm/hack.py
        `_hacked_clip_forward`, :23-68): ids (B, windows·75 usable tokens)
        split into `windows` chunks, each wrapped with SOT/EOT, encoded
        independently, hidden states concatenated along the sequence."""
        from prompt_diffusion_tpu.data.tokenizer import EOT, SOT

        b = token_ids.shape[0]
        # strip the caller's SOT/EOT, keep raw content tokens
        content = token_ids[:, 1:-1]
        per = 75
        need = windows * per
        pad = jnp.full((b, max(0, need - content.shape[1])), EOT, jnp.int32)
        content = jnp.concatenate([content[:, :need], pad], axis=1)[:, :need]
        outs = []
        layer = None if clip_skip == 0 else clip_skip + 1
        for w in range(windows):
            chunk = content[:, w * per : (w + 1) * per]
            ids = jnp.concatenate(
                [jnp.full((b, 1), SOT, jnp.int32), chunk, jnp.full((b, 1), EOT, jnp.int32)],
                axis=1,
            )
            enc = self.text_encoder.apply(params["clip"], ids, output_hidden_layer=layer)
            outs.append(enc["last_hidden_state"] if layer is None else enc["hidden"])
        return jnp.concatenate(outs, axis=1)  # (B, windows·77, D)

    def decode_latents(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        """latents (B,h,w,4) → images (B,H,W,3) in [0,1]."""
        z = latents / self.vae.config.scale_factor + self.vae.config.shift_factor
        img = self.vae.apply(params["vae"], z, method=AutoencoderKL.decode)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    def encode_image(self, params, images: jnp.ndarray, rng) -> jnp.ndarray:
        """images (B,H,W,3) in [-1,1] → sampled scaled latents (ddpm.py:655-662)."""
        from prompt_diffusion_tpu.models.vae import sample_from_moments

        moments = self.vae.apply(params["vae"], images, method=AutoencoderKL.encode_moments)
        z = sample_from_moments(moments, rng)
        return (z - self.vae.config.shift_factor) * self.vae.config.scale_factor

    def check_inputs(self, token_ids, neg_token_ids, example_pair, query):
        """Trace-time input validation with actionable messages
        (pipeline_prompt_diffusion.py:1051-1063 equivalent)."""
        b, h, w, c = query.shape
        if c != 3:
            raise ValueError(f"query must be (B,H,W,3) NHWC, got channels={c}")
        if example_pair.shape != (b, h, w, 6):
            raise ValueError(
                "example_pair must be the 6-channel (condition‖image) stack "
                f"matching query: expected {(b, h, w, 6)}, got {example_pair.shape}"
            )
        if h % 8 or w % 8:
            raise ValueError(
                f"image size must be divisible by 8 (VAE downsampling), got {h}x{w}"
            )
        for name, ids in (("token_ids", token_ids), ("neg_token_ids", neg_token_ids)):
            if ids.shape[0] != b:
                raise ValueError(
                    f"{name} batch {ids.shape[0]} != image batch {b}"
                )

    # ---- full generation --------------------------------------------------

    def generate(
        self,
        params,
        rng: jax.Array,
        token_ids: jnp.ndarray,  # (B, 77) prompt ids
        neg_token_ids: jnp.ndarray,  # (B, 77) negative/uncond ids
        example_pair: jnp.ndarray,  # (B, H, W, 6) condition‖image, [-1,1]
        query: jnp.ndarray,  # (B, H, W, 3) query condition, [-1,1]
        num_steps: int = 50,
        guidance_scale: float = 9.0,
        control_scale: float = 1.0,
        eta: float = 0.0,
        guess_mode: bool = False,
        init_noise: Optional[jnp.ndarray] = None,
        sampler: str = "ddim",
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
    ) -> jnp.ndarray:
        """Returns images (B, H, W, 3) in [0,1]. Jit with
        static_argnums on (num_steps, eta, guess_mode, sampler) via the
        cached wrapper below, or wrap yourself under pjit.

        `sampler` selects the denoise loop — "ddim" (reference default,
        the only one supporting eta>0), "plms", "unipc" (the reference
        diffusers drivers' UniPCMultistepScheduler,
        train_promptdiffusion_sd15.py:90-103), "dpm++" / "dpm"
        (DPM-Solver multistep order 2, data/noise prediction).

        `control_guidance_start`/`control_guidance_end` restrict the
        ControlNet to a fraction window of the sampling trajectory — the
        per-step `controlnet_keep` factor of the reference pipeline
        (pipeline_prompt_diffusion.py:1195-1235). Both fold as traced
        scalars: changing the window never recompiles."""
        from prompt_diffusion_tpu.pipelines.control_window import (
            control_keep, is_default_window, step_index_from_timestep,
            validate_window)

        if sampler not in ("ddim", "plms", "unipc", "dpm++", "dpm"):
            raise ValueError(f"unknown sampler {sampler!r}")
        if sampler != "ddim" and eta != 0.0:
            raise ValueError(f"eta>0 is DDIM-only (got sampler={sampler!r})")
        validate_window(control_guidance_start, control_guidance_end)
        windowed = not is_default_window(control_guidance_start, control_guidance_end)
        self.check_inputs(token_ids, neg_token_ids, example_pair, query)
        b, img_h, img_w, _ = query.shape
        lat_h, lat_w = img_h // 8, img_w // 8

        if sampler == "unipc":
            from prompt_diffusion_tpu.schedulers.unipc import UniPCTables

            tables = UniPCTables.create(self.schedule, num_steps)
        elif sampler in ("dpm++", "dpm"):
            from prompt_diffusion_tpu.schedulers.dpm_solver import DPMTables

            tables = DPMTables.create(self.schedule, num_steps)
        else:
            tables = DDIMTables.create(self.schedule, num_steps, eta=eta)

        ctx_cond = self.encode_prompt(params, token_ids)
        ctx_uncond = self.encode_prompt(params, neg_token_ids)
        # uncond first, cond second (ddim_hacked.py:186-193)
        context2 = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
        pair2 = jnp.concatenate([example_pair] * 2, axis=0)
        query2 = jnp.concatenate([query] * 2, axis=0)

        # control_scale is a python/traced scalar, or per-sample (B,1,1,1)
        # (the serving batcher mixes requests with different strengths in
        # one execution) — tile per-sample scales over the CFG double batch.
        per_sample = getattr(control_scale, "ndim", 0) >= 2
        cs2 = (
            jnp.concatenate([control_scale] * 2, axis=0) if per_sample else control_scale
        )
        if guess_mode:
            # notebook cell 5: strength * 0.825^(12−i) over the 13 taps
            decay = 0.825 ** jnp.arange(12, -1, -1, dtype=jnp.float32)
            ctrl_scale = tuple(cs2 * decay[i] for i in range(13))
        else:
            ctrl_scale = cs2

        # the hint embedding is t/x-independent — compute once, not 50×
        hint2 = self.controlnet.apply(
            params["controlnet"], example_pair=pair2, query=query2, hint_only=True
        )

        # Guess mode gives the *uncond* CFG branch no control at all
        # (notebook cell 5: un_cond["c_concat"] = None if guess_mode;
        # diffusers pipeline :370-378). Zeroing the additive zero-conv taps
        # for the uncond half (first half of the double batch) is exactly
        # control=None in the reference's skip-add.
        if guess_mode:
            branch_mask = jnp.concatenate(
                [jnp.zeros((b, 1, 1, 1), jnp.float32), jnp.ones((b, 1, 1, 1), jnp.float32)]
            )
        else:
            branch_mask = None

        def eps_fn(x, t_b):
            x2 = jnp.concatenate([x] * 2, axis=0)
            t2 = jnp.concatenate([t_b] * 2, axis=0)
            scale = ctrl_scale
            if windowed:
                # reference controlnet_keep[i]: i is the sampling-order
                # step index, N the full table length (:1196-1199)
                i = step_index_from_timestep(tables.timesteps, t_b[0])
                k = control_keep(i, int(tables.timesteps.shape[0]),
                                 control_guidance_start, control_guidance_end)
                scale = (tuple(c * k for c in ctrl_scale)
                         if isinstance(ctrl_scale, tuple) else ctrl_scale * k)
            control = self.controlnet.apply(
                params["controlnet"], x2, t2, context=context2,
                conditioning_scale=scale, guided_hint=hint2,
            )
            if branch_mask is not None:
                control = tuple(c * branch_mask.astype(c.dtype) for c in control)
            eps2 = self.unet.apply(params["unet"], x2, t2, context2, control=control)
            eps_uncond, eps_cond = jnp.split(eps2, 2, axis=0)
            return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

        rng, noise_rng, loop_rng = jax.random.split(rng, 3)
        if init_noise is None:
            x = jax.random.normal(noise_rng, (b, lat_h, lat_w, 4), dtype=jnp.float32)
        else:
            # caller-supplied x_T — per-request determinism in the serving
            # batcher (batch composition must not change a request's image)
            x = init_noise.astype(jnp.float32)

        if sampler == "unipc":
            from prompt_diffusion_tpu.schedulers.unipc import unipc_sample_loop

            x = unipc_sample_loop(eps_fn, x, tables)
        elif sampler in ("dpm++", "dpm"):
            from prompt_diffusion_tpu.schedulers.dpm_solver import (
                dpm_solver_multistep_loop,
            )

            x = dpm_solver_multistep_loop(eps_fn, x, tables,
                                          predict_x0=(sampler == "dpm++"))
        elif sampler == "plms":
            from prompt_diffusion_tpu.schedulers.plms import plms_sample_loop

            x = plms_sample_loop(eps_fn, x, tables)
        else:
            # ddim_sample_loop runs ALL tables.num_steps entries — which can
            # exceed num_steps when 1000 % num_steps != 0 (e.g. 30 → 31
            # entries; the reference iterates the full table,
            # ddim_hacked.py:145) — and matches the reference's stochastic
            # noise handling when eta > 0.
            x = ddim_sample_loop(eps_fn, x, tables,
                                 rng=loop_rng if eta > 0.0 else None)
        return self.decode_latents(params, x)

    def jit_generate(self, donate: bool = False):
        """Jitted generate with ONLY the loop-shaping args static.

        guidance_scale / control_scale fold fine as traced scalars — a CFG
        or strength change must NOT pay a recompile (the reference changes
        them per request, notebook cell 5). `donate=True` donates the
        caller-supplied init_noise buffer (the only argument safe to
        donate — params are reused across calls)."""
        return jax.jit(
            self.generate,
            static_argnames=("num_steps", "eta", "guess_mode", "sampler"),
            donate_argnames=("init_noise",) if donate else (),
        )

    # ---- init -------------------------------------------------------------

    def init_params(self, rng: jax.Array, image_size: int = 512, batch: int = 1):
        """Random-init parameter dict (for training-from-scratch / tests)."""
        h = w = image_size
        lh, lw = h // 8, w // 8
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        x = jnp.zeros((batch, lh, lw, 4))
        t = jnp.zeros((batch,), jnp.int32)
        ctx = jnp.zeros((batch, 77, self.text_encoder.config.hidden_size))
        ids = jnp.zeros((batch, 77), jnp.int32)
        return {
            "unet": self.unet.init(r1, x, t, ctx),
            "controlnet": self.controlnet.init(
                r2, x, t, jnp.zeros((batch, h, w, 6)), jnp.zeros((batch, h, w, 3)), ctx
            ),
            "vae": self.vae.init(r3, jnp.zeros((batch, h, w, 3))),
            "clip": self.text_encoder.init(r4, ids),
        }
