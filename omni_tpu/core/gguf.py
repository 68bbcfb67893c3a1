"""GGUF container reader/writer (pure Python + numpy, mmap-backed reads).

Implements GGUF v2/v3 little-endian: magic "GGUF", KV metadata section,
tensor directory, then alignment-padded tensor blobs. Format spec derived
from the reference implementation (/root/reference/ggml/src/gguf.cpp:1-1433,
/root/reference/ggml/include/gguf.h:42-46); this is a new implementation.

The reader memory-maps the file and exposes zero-copy uint8 views of tensor
data; dequantization to float is done lazily by `omni_tpu.core.quants`.
"""

from __future__ import annotations

import enum
import mmap
import os
import struct
from dataclasses import dataclass, field
from typing import Any, BinaryIO

import numpy as np

from .dtypes import GGMLType, row_nbytes, type_traits

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian
GGUF_VERSION = 3
GGUF_DEFAULT_ALIGNMENT = 32


class GGUFValueType(enum.IntEnum):
    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


_SCALAR_FMT: dict[GGUFValueType, str] = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.BOOL: "<?",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}


def _guess_value_type(v: Any) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, int):
        if v < 0:
            return GGUFValueType.INT64 if v < -(2**31) else GGUFValueType.INT32
        return GGUFValueType.UINT64 if v >= 2**32 else GGUFValueType.UINT32
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, (str, bytes)):
        return GGUFValueType.STRING
    if isinstance(v, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot map {type(v)} to a GGUF value type")


@dataclass
class TensorInfo:
    name: str
    shape: tuple[int, ...]  # numpy order (outermost first); file stores ne[] reversed
    ggml_type: GGMLType
    offset: int  # relative to data section start
    data: np.ndarray | None = None  # uint8 view for quantized, typed for plain

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def nbytes(self) -> int:
        # row = innermost dimension (shape[-1])
        n_rows = self.n_elements // (self.shape[-1] if self.shape else 1)
        return n_rows * row_nbytes(self.ggml_type, self.shape[-1] if self.shape else 1)


class GGUFReader:
    """mmap-backed GGUF reader.

    `reader.kv` maps metadata keys to Python values; `reader.tensors` maps
    tensor names to `TensorInfo` with `.data` as a zero-copy numpy view.
    """

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        self._file = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self._buf = np.frombuffer(self._mm, dtype=np.uint8)
        self._pos = 0
        self.kv: dict[str, Any] = {}
        self.tensors: dict[str, TensorInfo] = {}
        self._parse()

    # -- low-level scanners ------------------------------------------------
    def _read_fmt(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, self._mm, self._pos)
        self._pos += size
        return vals[0] if len(vals) == 1 else vals

    def _read_string(self) -> str:
        n = self._read_fmt("<Q")
        s = bytes(self._mm[self._pos : self._pos + n])
        self._pos += n
        return s.decode("utf-8", errors="replace")

    def _read_value(self, vtype: GGUFValueType) -> Any:
        if vtype == GGUFValueType.STRING:
            return self._read_string()
        if vtype == GGUFValueType.ARRAY:
            etype = GGUFValueType(self._read_fmt("<I"))
            n = self._read_fmt("<Q")
            if etype in _SCALAR_FMT and etype != GGUFValueType.BOOL:
                fmt = _SCALAR_FMT[etype][1]
                arr = np.frombuffer(
                    self._mm, dtype=np.dtype(fmt).newbyteorder("<"),
                    count=n, offset=self._pos,
                )
                self._pos += arr.nbytes
                return arr
            return [self._read_value(etype) for _ in range(n)]
        return self._read_fmt(_SCALAR_FMT[vtype])

    # -- parse -------------------------------------------------------------
    def _parse(self) -> None:
        magic = self._read_fmt("<I")
        if magic != GGUF_MAGIC:
            raise ValueError(f"{self.path}: not a GGUF file (magic {magic:#x})")
        self.version = self._read_fmt("<I")
        if self.version not in (2, 3):
            raise ValueError(f"{self.path}: unsupported GGUF version {self.version}")
        n_tensors = self._read_fmt("<q")
        n_kv = self._read_fmt("<q")

        for _ in range(n_kv):
            key = self._read_string()
            vtype = GGUFValueType(self._read_fmt("<I"))
            self.kv[key] = self._read_value(vtype)

        infos: list[TensorInfo] = []
        for _ in range(n_tensors):
            name = self._read_string()
            n_dims = self._read_fmt("<I")
            ne = [self._read_fmt("<Q") for _ in range(n_dims)]
            ggml_type = GGMLType(self._read_fmt("<I"))
            offset = self._read_fmt("<Q")
            # GGUF stores ggml ne order (innermost first); numpy order reverses.
            infos.append(TensorInfo(name, tuple(reversed(ne)), ggml_type, offset))

        self.alignment = int(self.kv.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))
        data_start = (self._pos + self.alignment - 1) // self.alignment * self.alignment
        self.data_start = data_start

        for info in infos:
            start = data_start + info.offset
            raw = self._buf[start : start + info.nbytes]
            tr = type_traits(info.ggml_type)
            if tr.is_quantized:
                info.data = raw.reshape(info.n_elements // tr.block_size, tr.type_size)
            else:
                info.data = raw.view(tr.numpy_dtype).reshape(info.shape)
            self.tensors[info.name] = info

    # -- convenience -------------------------------------------------------
    def __contains__(self, name: str) -> bool:
        return name in self.tensors

    def tensor_names(self) -> list[str]:
        return list(self.tensors)

    def close(self) -> None:
        """Release the file handle. The mmap itself can only be unmapped once
        no tensor views remain; if views are still alive we leave it to GC."""
        self._file.close()
        try:
            self._buf = None
            self._mm.close()
        except BufferError:
            pass  # live tensor views keep the mapping alive until GC

    def __enter__(self) -> "GGUFReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class GGUFWriter:
    """Streaming GGUF v3 writer (used by tests, converters, and the
    quantize tool; counterpart of gguf_write in the reference)."""

    def __init__(self, path: str | os.PathLike, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.path = os.fspath(path)
        self.alignment = alignment
        self._kv: list[tuple[str, GGUFValueType, Any]] = []
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, np.ndarray]] = []

    def add_kv(self, key: str, value: Any, vtype: GGUFValueType | None = None) -> None:
        self._kv.append((key, vtype or _guess_value_type(value), value))

    def add_tensor(
        self,
        name: str,
        data: np.ndarray,
        ggml_type: GGMLType | None = None,
        logical_shape: tuple[int, ...] | None = None,
    ) -> None:
        """Add a tensor. For quantized types pass raw bytes (uint8) plus the
        logical element shape; for plain types pass the typed array."""
        if ggml_type is None:
            ggml_type = {
                np.dtype(np.float32): GGMLType.F32,
                np.dtype(np.float16): GGMLType.F16,
                np.dtype(np.int32): GGMLType.I32,
                np.dtype(np.int8): GGMLType.I8,
            }[data.dtype]
        shape = logical_shape if logical_shape is not None else data.shape
        self._tensors.append((name, tuple(shape), GGMLType(ggml_type), data))

    # -- serialization -----------------------------------------------------
    def _write_string(self, f: BinaryIO, s: str) -> None:
        b = s.encode("utf-8")
        f.write(struct.pack("<Q", len(b)))
        f.write(b)

    def _write_value(self, f: BinaryIO, vtype: GGUFValueType, v: Any) -> None:
        if vtype == GGUFValueType.STRING:
            self._write_string(f, v if isinstance(v, str) else v.decode())
        elif vtype == GGUFValueType.ARRAY:
            v = list(v) if not isinstance(v, np.ndarray) else v
            if len(v) == 0:
                etype = GGUFValueType.INT32
            else:
                etype = _guess_value_type(v[0].item() if isinstance(v, np.ndarray) else v[0])
            f.write(struct.pack("<IQ", etype, len(v)))
            for e in v:
                self._write_value(f, etype, e.item() if isinstance(e, np.generic) else e)
        else:
            f.write(struct.pack(_SCALAR_FMT[vtype], v))

    def write(self) -> None:
        with open(self.path, "wb") as f:
            f.write(struct.pack("<IIqq", GGUF_MAGIC, GGUF_VERSION,
                                len(self._tensors), len(self._kv)))
            for key, vtype, v in self._kv:
                self._write_string(f, key)
                f.write(struct.pack("<I", vtype))
                self._write_value(f, vtype, v)

            offset = 0
            blobs: list[bytes] = []
            for name, shape, ggml_type, data in self._tensors:
                self._write_string(f, name)
                ne = tuple(reversed(shape))
                f.write(struct.pack("<I", len(ne)))
                for d in ne:
                    f.write(struct.pack("<Q", d))
                f.write(struct.pack("<IQ", ggml_type, offset))
                blob = np.ascontiguousarray(data).tobytes()
                n_el = int(np.prod(shape)) if shape else 1
                expect = row_nbytes(ggml_type, shape[-1]) * (n_el // shape[-1]) if shape else 0
                if len(blob) != expect:
                    raise ValueError(
                        f"tensor {name}: blob is {len(blob)} bytes, "
                        f"{GGMLType(ggml_type).name} x {shape} needs {expect}"
                    )
                blobs.append(blob)
                offset += (len(blob) + self.alignment - 1) // self.alignment * self.alignment

            pos = f.tell()
            pad = (-pos) % self.alignment
            f.write(b"\x00" * pad)
            for blob in blobs:
                f.write(blob)
                f.write(b"\x00" * ((-len(blob)) % self.alignment))
