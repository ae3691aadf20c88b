from prompt_diffusion_tpu.serving.server import (
    GenerationRequest,
    GenerationServer,
    ServerConfig,
)

__all__ = ["GenerationRequest", "GenerationServer", "ServerConfig"]
