from .schedulers import DDIMScheduler, EulerScheduler, FlowMatchScheduler
from .batching import Request, ContinuousBatcher
from .diffusion import sd_generate, flux_generate

__all__ = [
    "DDIMScheduler", "EulerScheduler", "FlowMatchScheduler",
    "Request", "ContinuousBatcher", "sd_generate", "flux_generate",
]
