from prompt_diffusion_tpu.annotators.canny import canny
from prompt_diffusion_tpu.annotators.util import hwc3, resize_image
