"""ctypes bindings for libomni_native (the C++ host runtime layer).

Native components (see native/): GGUF mmap loader, quant codecs, TPU SoA
repack, WAV/log-mel preprocessing — the pieces the reference implements in
C/C++ for speed (SURVEY.md §2.1). Every caller degrades gracefully to the
numpy implementation when the library is absent; `available()` reports
which path is active. Build with scripts/build_native.sh.
"""

from __future__ import annotations

import ctypes as C
import os
from functools import lru_cache

import numpy as np

_LIB_ENV = "OMNI_NATIVE_LIB"
_DEFAULT_THREADS = max(os.cpu_count() or 1, 1)


@lru_cache(maxsize=1)
def _lib():
    candidates = []
    if os.environ.get(_LIB_ENV):
        candidates.append(os.environ[_LIB_ENV])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates += [
        os.path.join(root, "native", "build", "libomni_native.so"),
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "libomni_native.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = C.CDLL(path)
                _declare(lib)
                return lib
            except OSError:
                continue
    return None


def available() -> bool:
    return _lib() is not None


def _declare(lib) -> None:
    u8p = C.POINTER(C.c_uint8)
    f32p = C.POINTER(C.c_float)
    i8p = C.POINTER(C.c_int8)
    i64 = C.c_int64

    lib.on_version.restype = C.c_int
    lib.on_dequantize.argtypes = [C.c_int, u8p, i64, f32p, C.c_int]
    lib.on_quantize.argtypes = [C.c_int, f32p, i64, u8p, C.c_int]
    lib.on_repack_q8_0.argtypes = [u8p, i64, i64, i8p, f32p, C.c_int]
    lib.on_repack_q4_k.argtypes = [u8p, i64, i64, u8p, i8p, i8p, f32p, f32p, C.c_int]
    lib.on_repack_q5_k.argtypes = [u8p, i64, i64, u8p, i8p, i8p, f32p, f32p, u8p, C.c_int]
    lib.on_repack_q6_k.argtypes = [u8p, i64, i64, i8p, i8p, f32p, C.c_int]
    lib.on_repack_q4_01.argtypes = [C.c_int, u8p, i64, i64, u8p, f32p,
                                    f32p, C.c_int]
    lib.on_repack_q5_01.argtypes = [C.c_int, u8p, i64, i64, u8p, u8p,
                                    f32p, f32p, C.c_int]
    lib.on_repack_i8_plane.argtypes = [C.c_int, u8p, i64, i64, i8p, f32p,
                                       C.c_int]
    lib.on_repack_iq4_xs.argtypes = [u8p, i64, i64, i8p, i8p, f32p,
                                     C.c_int]
    lib.on_repack_q2_k.argtypes = [u8p, i64, i64, u8p, i8p, i8p, f32p,
                                   f32p, C.c_int]
    lib.on_repack_q3_k.argtypes = [u8p, i64, i64, u8p, i8p, u8p, f32p,
                                   C.c_int]

    lib.on_gguf_open.restype = C.c_void_p
    lib.on_gguf_open.argtypes = [C.c_char_p]
    lib.on_gguf_close.argtypes = [C.c_void_p]
    lib.on_gguf_n_tensors.argtypes = [C.c_void_p]
    lib.on_gguf_n_tensors.restype = i64
    lib.on_gguf_version.argtypes = [C.c_void_p]
    lib.on_gguf_version.restype = C.c_uint32
    lib.on_gguf_data_offset.argtypes = [C.c_void_p]
    lib.on_gguf_data_offset.restype = i64
    lib.on_gguf_tensor_name.argtypes = [C.c_void_p, i64]
    lib.on_gguf_tensor_name.restype = C.c_char_p
    lib.on_gguf_tensor_type.argtypes = [C.c_void_p, i64]
    lib.on_gguf_tensor_type.restype = C.c_int
    lib.on_gguf_tensor_ndims.argtypes = [C.c_void_p, i64]
    lib.on_gguf_tensor_ndims.restype = C.c_int
    lib.on_gguf_tensor_shape.argtypes = [C.c_void_p, i64, C.POINTER(i64)]
    lib.on_gguf_tensor_nbytes.argtypes = [C.c_void_p, i64]
    lib.on_gguf_tensor_nbytes.restype = i64
    lib.on_gguf_tensor_data.argtypes = [C.c_void_p, i64]
    lib.on_gguf_tensor_data.restype = C.c_void_p

    lib.on_log_mel.argtypes = [f32p, i64, f32p, C.c_int, i64, f32p, C.c_int]
    lib.on_read_wav_mono_16k.argtypes = [C.c_char_p, C.POINTER(f32p), C.POINTER(i64)]
    lib.on_write_wav.argtypes = [C.c_char_p, f32p, i64, C.c_int]
    lib.on_free.argtypes = [C.c_void_p]


def _p(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(C.POINTER(ctype))


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def dequantize(ggml_type: int, blocks: np.ndarray, n_elems: int,
               n_threads: int = _DEFAULT_THREADS) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(blocks).view(np.uint8).reshape(-1)
    out = np.empty(n_elems, np.float32)
    rc = lib.on_dequantize(int(ggml_type), _p(b, C.c_uint8), n_elems,
                           _p(out, C.c_float), n_threads)
    return out if rc == 0 else None


def quantize(ggml_type: int, x: np.ndarray, out_nbytes: int,
             n_threads: int = _DEFAULT_THREADS) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    xx = np.ascontiguousarray(x, np.float32).reshape(-1)
    out = np.empty(out_nbytes, np.uint8)
    rc = lib.on_quantize(int(ggml_type), _p(xx, C.c_float), xx.size,
                         _p(out, C.c_uint8), n_threads)
    return out if rc == 0 else None


def repack(ggml_type: int, blocks: np.ndarray, n: int, k: int,
           n_threads: int = _DEFAULT_THREADS) -> dict[str, np.ndarray] | None:
    """GGUF block bytes -> K-major SoA planes (matching kernels.qformats)."""
    lib = _lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(blocks).view(np.uint8).reshape(-1)
    t = int(ggml_type)
    if t == 8:  # Q8_0
        q = np.empty((k, n), np.int8)
        d = np.empty((k // 32, n), np.float32)
        rc = lib.on_repack_q8_0(_p(b, C.c_uint8), n, k, _p(q, C.c_int8),
                                _p(d, C.c_float), n_threads)
        return {"q": q, "d": d} if rc == 0 else None
    if t == 12:  # Q4_K
        q = np.empty((k // 2, n), np.uint8)
        sc = np.empty((k // 32, n), np.int8)
        mn = np.empty((k // 32, n), np.int8)
        d = np.empty((k // 256, n), np.float32)
        dm = np.empty((k // 256, n), np.float32)
        rc = lib.on_repack_q4_k(_p(b, C.c_uint8), n, k, _p(q, C.c_uint8),
                                _p(sc, C.c_int8), _p(mn, C.c_int8),
                                _p(d, C.c_float), _p(dm, C.c_float), n_threads)
        return {"q": q, "sc": sc, "mn": mn, "d": d, "dm": dm} if rc == 0 else None
    if t == 13:  # Q5_K
        q = np.empty((k // 2, n), np.uint8)
        sc = np.empty((k // 32, n), np.int8)
        mn = np.empty((k // 32, n), np.int8)
        d = np.empty((k // 256, n), np.float32)
        dm = np.empty((k // 256, n), np.float32)
        qh = np.empty((k // 8, n), np.uint8)
        rc = lib.on_repack_q5_k(_p(b, C.c_uint8), n, k, _p(q, C.c_uint8),
                                _p(sc, C.c_int8), _p(mn, C.c_int8),
                                _p(d, C.c_float), _p(dm, C.c_float),
                                _p(qh, C.c_uint8), n_threads)
        return ({"q": q, "sc": sc, "mn": mn, "d": d, "dm": dm, "qh": qh}
                if rc == 0 else None)
    if t == 14:  # Q6_K
        q = np.empty((k, n), np.int8)
        sc = np.empty((k // 16, n), np.int8)
        d = np.empty((k // 256, n), np.float32)
        rc = lib.on_repack_q6_k(_p(b, C.c_uint8), n, k, _p(q, C.c_int8),
                                _p(sc, C.c_int8), _p(d, C.c_float), n_threads)
        return {"q": q, "sc": sc, "d": d} if rc == 0 else None
    if t in (2, 3):  # Q4_0 / Q4_1
        q = np.empty((k // 2, n), np.uint8)
        d = np.empty((k // 32, n), np.float32)
        dm = np.empty((k // 32, n), np.float32) if t == 3 else None
        rc = lib.on_repack_q4_01(
            t, _p(b, C.c_uint8), n, k, _p(q, C.c_uint8), _p(d, C.c_float),
            _p(dm, C.c_float) if t == 3 else None, n_threads)
        if rc != 0:
            return None
        out = {"q": q, "d": d}
        if dm is not None:
            out["dm"] = dm
        return out
    if t in (6, 7):  # Q5_0 / Q5_1
        q = np.empty((k // 2, n), np.uint8)
        qh = np.empty((k // 8, n), np.uint8)
        d = np.empty((k // 32, n), np.float32)
        dm = np.empty((k // 32, n), np.float32) if t == 7 else None
        rc = lib.on_repack_q5_01(
            t, _p(b, C.c_uint8), n, k, _p(q, C.c_uint8), _p(qh, C.c_uint8),
            _p(d, C.c_float), _p(dm, C.c_float) if t == 7 else None,
            n_threads)
        if rc != 0:
            return None
        out = {"q": q, "qh": qh, "d": d}
        if dm is not None:
            out["dm"] = dm
        return out
    if t in (20, 39):  # IQ4_NL / MXFP4: int8 value planes
        q = np.empty((k, n), np.int8)
        d = np.empty((k // 32, n), np.float32)
        rc = lib.on_repack_i8_plane(t, _p(b, C.c_uint8), n, k,
                                    _p(q, C.c_int8), _p(d, C.c_float),
                                    n_threads)
        return {"q": q, "d": d} if rc == 0 else None
    if t == 23:  # IQ4_XS
        q = np.empty((k, n), np.int8)
        sc = np.empty((k // 32, n), np.int8)
        d = np.empty((k // 256, n), np.float32)
        rc = lib.on_repack_iq4_xs(_p(b, C.c_uint8), n, k, _p(q, C.c_int8),
                                  _p(sc, C.c_int8), _p(d, C.c_float),
                                  n_threads)
        return {"q": q, "sc": sc, "d": d} if rc == 0 else None
    if t == 10:  # Q2_K: packed quarter plane + per-16 scale/min
        q = np.empty((k // 4, n), np.uint8)
        sc = np.empty((k // 16, n), np.int8)
        mn = np.empty((k // 16, n), np.int8)
        d = np.empty((k // 256, n), np.float32)
        dm = np.empty((k // 256, n), np.float32)
        rc = lib.on_repack_q2_k(_p(b, C.c_uint8), n, k, _p(q, C.c_uint8),
                                _p(sc, C.c_int8), _p(mn, C.c_int8),
                                _p(d, C.c_float), _p(dm, C.c_float),
                                n_threads)
        return ({"q": q, "sc": sc, "mn": mn, "d": d, "dm": dm}
                if rc == 0 else None)
    if t == 11:  # Q3_K: quarter plane + high-bit plane + int8 scales
        q = np.empty((k // 4, n), np.uint8)
        sc = np.empty((k // 16, n), np.int8)
        qh = np.empty((k // 8, n), np.uint8)
        d = np.empty((k // 256, n), np.float32)
        rc = lib.on_repack_q3_k(_p(b, C.c_uint8), n, k, _p(q, C.c_uint8),
                                _p(sc, C.c_int8), _p(qh, C.c_uint8),
                                _p(d, C.c_float), n_threads)
        return ({"q": q, "sc": sc, "qh": qh, "d": d} if rc == 0 else None)
    return None


# ---------------------------------------------------------------------------
# GGUF loader
# ---------------------------------------------------------------------------

class NativeGGUF:
    """mmap-backed tensor directory (data-loader hot path). KV metadata is
    parsed by the Python GGUFReader; this serves the blobs zero-copy."""

    def __init__(self, path: str):
        lib = _lib()
        if lib is None:
            raise RuntimeError("libomni_native not built")
        self._lib = lib
        self._h = lib.on_gguf_open(os.fspath(path).encode())
        if not self._h:
            raise OSError(f"native gguf open failed: {path}")
        self.version = int(lib.on_gguf_version(self._h))
        self.tensors: dict[str, tuple[int, tuple[int, ...], int]] = {}
        self._index: dict[str, int] = {}
        for i in range(int(lib.on_gguf_n_tensors(self._h))):
            name = lib.on_gguf_tensor_name(self._h, i).decode()
            t = int(lib.on_gguf_tensor_type(self._h, i))
            nd = int(lib.on_gguf_tensor_ndims(self._h, i))
            shape_buf = (C.c_int64 * 4)()
            lib.on_gguf_tensor_shape(self._h, i, shape_buf)
            shape = tuple(int(shape_buf[j]) for j in range(max(nd, 1)))
            nbytes = int(lib.on_gguf_tensor_nbytes(self._h, i))
            self.tensors[name] = (t, shape, nbytes)
            self._index[name] = i

    def tensor_bytes(self, name: str) -> np.ndarray:
        """Zero-copy uint8 view of a tensor's block bytes."""
        i = self._index[name]
        ptr = self._lib.on_gguf_tensor_data(self._h, i)
        nbytes = self.tensors[name][2]
        return np.ctypeslib.as_array(
            C.cast(ptr, C.POINTER(C.c_uint8)), shape=(nbytes,))

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.on_gguf_close(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

def log_mel(samples: np.ndarray, mel_filters: np.ndarray,
            n_frames: int | None = None,
            n_threads: int = _DEFAULT_THREADS) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    s = np.ascontiguousarray(samples, np.float32)
    mf = np.ascontiguousarray(mel_filters, np.float32)
    n_mel = mf.shape[0]
    if n_frames is None:
        n_frames = int(round(len(s) / 160))
    out = np.empty((n_frames, n_mel), np.float32)
    rc = lib.on_log_mel(_p(s, C.c_float), len(s), _p(mf, C.c_float), n_mel,
                        n_frames, _p(out, C.c_float), n_threads)
    return out if rc == 0 else None


def read_wav_mono_16k(path: str) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    ptr = C.POINTER(C.c_float)()
    n = C.c_int64()
    rc = lib.on_read_wav_mono_16k(os.fspath(path).encode(), C.byref(ptr),
                                  C.byref(n))
    if rc != 0:
        return None
    out = np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    lib.on_free(ptr)
    return out


def write_wav(path: str, samples: np.ndarray, rate: int = 24000) -> bool:
    lib = _lib()
    if lib is None:
        return False
    s = np.ascontiguousarray(samples, np.float32)
    return lib.on_write_wav(os.fspath(path).encode(), _p(s, C.c_float),
                            len(s), rate) == 0
