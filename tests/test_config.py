"""Config system tests (yaml → pipeline)."""

import os

import pytest

from prompt_diffusion_tpu.utils.config import _minimal_yaml, create_model

REF_YAML = "/root/reference/models/cldm_v15.yaml"


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference yaml not mounted")
def test_create_model_from_reference_yaml():
    pipe = create_model(REF_YAML)
    assert pipe.unet.config.model_channels == 320
    assert pipe.unet.config.channel_mult == (1, 2, 4, 4)
    assert pipe.unet.config.context_dim == 768
    assert pipe.controlnet.hint_channels == 6
    assert pipe.vae.config.ch == 128
    assert pipe.vae.config.scale_factor == pytest.approx(0.18215)
    assert pipe.schedule.num_timesteps == 1000
    assert float(pipe.schedule.betas[0]) == pytest.approx(0.00085, rel=1e-5)


def test_minimal_yaml_fallback_parser():
    text = """
model:
  target: some.Target
  params:
    lr: 1.5e-4
    steps: 1000
    flag: True
    mult: [ 1, 2, 4 ]
    nested:
      a: "x"
"""
    d = _minimal_yaml(text)
    p = d["model"]["params"]
    assert p["lr"] == pytest.approx(1.5e-4)
    assert p["steps"] == 1000 and p["flag"] is True
    assert p["mult"] == [1, 2, 4]
    assert p["nested"]["a"] == "x"
