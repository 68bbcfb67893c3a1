from .dtypes import GGMLType, QK_K, TypeTraits, row_nbytes, type_traits
from .gguf import GGUFReader, GGUFValueType, GGUFWriter, TensorInfo
from . import quants

__all__ = [
    "GGMLType",
    "QK_K",
    "TypeTraits",
    "row_nbytes",
    "type_traits",
    "GGUFReader",
    "GGUFValueType",
    "GGUFWriter",
    "TensorInfo",
    "quants",
]
