from .bcr import TpuBwt  # noqa: F401
