from prompt_diffusion_tpu.serving.server import (
    GenerationRequest,
    GenerationServer,
    SD3Adapter,
    SD3GenerationRequest,
    SD15Adapter,
    ServerConfig,
)

__all__ = [
    "GenerationRequest",
    "GenerationServer",
    "SD3Adapter",
    "SD3GenerationRequest",
    "SD15Adapter",
    "ServerConfig",
]
