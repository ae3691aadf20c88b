from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy
