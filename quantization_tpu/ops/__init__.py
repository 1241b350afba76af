"""Pallas TPU kernels (the framework's native tier).

The reference has no native code at all (SURVEY.md section 2); its hot
tensor programs run as interpreted torch op graphs.  Here the encode hot
path is a single fused Mosaic kernel per batch tile.
"""

from .seqbeam import seqbeam_encode_indexes, SEQBEAM_SUPPORTED  # noqa: F401
from .decode import decode_kernel, DECODE_KERNEL_SUPPORTED  # noqa: F401
