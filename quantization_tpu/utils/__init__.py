from .checkpoint import checkpoint, remat
from .serialization import load_quantizer, save_quantizer

__all__ = ["checkpoint", "remat", "load_quantizer", "save_quantizer"]
