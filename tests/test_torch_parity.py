"""Golden parity tests: our Flax modules vs the reference torch modules.

Strategy: instantiate the REFERENCE torch module (tiny config, random
weights), export its state dict through tools/torch_import, and require the
Flax output to match the torch output elementwise in fp32. This validates
the import key-mapping AND every numeric choice (GroupNorm eps, attention
scale, GEGLU, timestep embedding order, upsample alignment) in one shot.

Skipped when /root/reference is not present.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    """Make the reference importable; stub its heavy optional deps."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # stub torchvision (cldm imports make_grid; never called here). Stubs
    # need a real ModuleSpec or importlib.util.find_spec (used by
    # transformers' availability probing) raises ValueError.
    import importlib.machinery

    # another test module (test_annotator_parity) may have stubbed
    # torchvision already, without the .utils submodule — ensure both
    # entries exist whichever test ran first.
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv.__version__ = "0.0.0-stub"
        sys.modules["torchvision"] = tv
    if "torchvision.utils" not in sys.modules:
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.__spec__ = importlib.machinery.ModuleSpec("torchvision.utils", None)
        tv_utils.make_grid = lambda *a, **k: None
        tv.utils = tv_utils
        sys.modules["torchvision.utils"] = tv_utils
    # stub omegaconf (openaimodel imports ListConfig for an isinstance check)
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        oc.ListConfig = ListConfig
        oc.OmegaConf = None
        oc.DictConfig = dict
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    # stub pytorch_lightning (ddpm/autoencoder subclass LightningModule)
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

            def log_dict(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.Callback = object
        pl.seed_everything = lambda *a, **k: None
        util = types.ModuleType("pytorch_lightning.utilities")
        util.rank_zero_only = lambda f: f
        rank_zero = types.ModuleType("pytorch_lightning.utilities.rank_zero")
        rank_zero.rank_zero_only = util.rank_zero_only
        dist = types.ModuleType("pytorch_lightning.utilities.distributed")
        dist.rank_zero_only = util.rank_zero_only
        pl.utilities = util
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = util
        sys.modules["pytorch_lightning.utilities.rank_zero"] = rank_zero
        sys.modules["pytorch_lightning.utilities.distributed"] = dist
    yield


def _to_jax_nhwc(x_t):
    import jax.numpy as jnp

    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


TINY = dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_heads=4, context_dim=64)


def _torch_unet():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    return UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=64, legacy=False, use_checkpoint=False,
    ).eval().float()


def test_unet_forward_parity():
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.tools.torch_import import apply_rules, unet_key_rules
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy
    import jax, jax.numpy as jnp

    tm = _torch_unet()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = UNetConfig(**TINY)
    params = {"params": apply_rules(sd, unet_key_rules(cfg), "")}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.asarray([3, 977], dtype=np.int64)
    ctx = rng.normal(size=(2, 7, 64)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy()

    model = UNetSD15(config=cfg, policy=fp32_policy())
    out = jax.jit(model.apply)(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=2e-4, rtol=1e-3)


def test_controlnet_forward_parity():
    from cldm.cldm import ControlNet as TorchControlNet
    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig
    from prompt_diffusion_tpu.tools.torch_import import apply_rules, unet_key_rules
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy
    import jax, jax.numpy as jnp

    torch.manual_seed(1)
    tm = TorchControlNet(
        image_size=32, in_channels=4, model_channels=32, hint_channels=6,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=64, legacy=False, use_checkpoint=False,
    ).eval().float()
    # make the zero-convs non-zero so the comparison is meaningful
    with torch.no_grad():
        for m in tm.zero_convs:
            m[0].weight.normal_(0, 0.02)
            m[0].bias.normal_(0, 0.02)
        tm.middle_block_out[0].weight.normal_(0, 0.02)
        tm.input_hint_block[-1].weight.normal_(0, 0.02)
        tm.input_cond_block[-1].weight.normal_(0, 0.02)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = UNetConfig(**TINY)
    params = {"params": apply_rules(sd, unet_key_rules(cfg, is_controlnet=True), "")}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    t = np.asarray([42], dtype=np.int64)
    ctx = rng.normal(size=(1, 7, 64)).astype(np.float32)
    pair = rng.normal(size=(1, 6, 128, 128)).astype(np.float32)
    query = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            x=torch.from_numpy(x), timesteps=torch.from_numpy(t),
            example_pair=torch.from_numpy(pair), query=torch.from_numpy(query),
            context=torch.from_numpy(ctx),
        )

    model = ControlNetSD15(config=cfg, hint_channels=6, policy=fp32_policy())
    outs = jax.jit(model.apply)(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(pair.transpose(0, 2, 3, 1)), jnp.asarray(query.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx),
    )
    assert len(outs) == len(ref)
    for got, want in zip(outs, ref):
        np.testing.assert_allclose(_from_nhwc(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_vae_parity():
    from ldm.models.autoencoder import AutoencoderKL as TorchVAE
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from prompt_diffusion_tpu.tools.torch_import import apply_rules, vae_key_rules
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy
    import jax, jax.numpy as jnp

    torch.manual_seed(3)
    ddconfig = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
                    out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[], dropout=0.0)
    tm = TorchVAE(ddconfig=ddconfig, lossconfig={"target": "torch.nn.Identity"},
                  embed_dim=4).eval().float()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params = {"params": apply_rules(sd, vae_key_rules(cfg.ch_mult, cfg.num_res_blocks), "")}

    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments_ref = tm.quant_conv(tm.encoder(torch.from_numpy(img))).numpy()
    model = AutoencoderKL(config=cfg, policy=fp32_policy())
    moments = jax.jit(lambda p, x: model.apply(p, x, method=AutoencoderKL.encode_moments))(
        params, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(_from_nhwc(moments), moments_ref, atol=2e-4, rtol=1e-3)

    z = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        dec_ref = tm.decode(torch.from_numpy(z)).numpy()
    dec = jax.jit(lambda p, z: model.apply(p, z, method=AutoencoderKL.decode))(
        params, jnp.asarray(z.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(_from_nhwc(dec), dec_ref, atol=3e-4, rtol=1e-3)


def test_t5_parity():
    transformers = pytest.importorskip("transformers")
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from prompt_diffusion_tpu.models.t5_text import T5Config, T5Encoder
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy
    import jax, jax.numpy as jnp

    torch.manual_seed(7)
    hf_cfg = HFT5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        dense_act_fn="gelu_new", is_gated_act=True, tie_word_embeddings=False,
    )
    tm = T5EncoderModel(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # the real importer's mapping (also exercised by import_sd3_folder)
    from prompt_diffusion_tpu.tools.diffusers_import import t5_params_from_state_dict

    p = t5_params_from_state_dict(sd, 2)

    ids = np.random.default_rng(8).integers(0, 256, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    model = T5Encoder(
        config=T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                        num_layers=2, num_heads=4),
        policy=fp32_policy(),
    )
    out = jax.jit(model.apply)({"params": p}, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)


def test_clip_parity():
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel as HFModel
    from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from prompt_diffusion_tpu.tools.torch_import import apply_rules, clip_key_rules
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy
    import jax, jax.numpy as jnp

    torch.manual_seed(5)
    hf_cfg = HFConfig(vocab_size=500, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=77, hidden_act="quick_gelu")
    tm = HFModel(hf_cfg).eval().float()
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": apply_rules(sd, clip_key_rules(num_layers=2), "")}

    ids = np.random.default_rng(6).integers(0, 500, size=(2, 77)).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    model = CLIPTextModel(
        config=CLIPTextConfig(vocab_size=500, hidden_size=64, num_layers=2,
                              num_heads=4, intermediate_size=128),
        policy=fp32_policy(),
    )
    out = jax.jit(model.apply)(params, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), ref, atol=2e-4, rtol=1e-3)
