from .qformats import NATIVE_QTYPES, QTensor, dequant, load_quantized, repack
from .dequant_matmul import matmul, qmatmul_pallas, qmatmul_xla

__all__ = [
    "NATIVE_QTYPES",
    "QTensor",
    "dequant",
    "load_quantized",
    "repack",
    "matmul",
    "qmatmul_pallas",
    "qmatmul_xla",
]
