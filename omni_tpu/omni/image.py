"""Host-side image preprocessing: LLaVA-UHD slicing for MiniCPM-V/o.

Algorithm contract from the reference (/root/reference/tools/omni/
vision.cpp llava_uhd:1452-1640): an overview image downscaled to ≤
slice_size (aspect-preserving, dims rounded to patch multiples), plus up to
`max_slice_nums` refined slices on a best-fit grid chosen by aspect-ratio
log error; bicubic resize for overview/original, bilinear for the refined
image, per-channel mean/std normalization from GGUF metadata. The runtime
`max_slice_nums` override is the high-res mode switch
(vision.cpp:182-183, omni.h:464).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass
class SliceInstructions:
    overview_size: tuple[int, int]  # (w, h)
    refined_size: tuple[int, int]
    grid: tuple[int, int]  # (gx, gy)
    slices: list[tuple[int, int, int, int]]  # (x, y, w, h)


def _ensure_divide(length: int, patch: int) -> int:
    return max(int(round(length / patch)) * patch, patch)


def _best_resize(w: int, h: int, scale_res: int, patch: int,
                 allow_upscale: bool = False) -> tuple[int, int]:
    if w * h > scale_res * scale_res or allow_upscale:
        r = w / h
        h = int(scale_res / math.sqrt(r))
        w = int(h * r)
    return _ensure_divide(w, patch), _ensure_divide(h, patch)


def _best_grid(max_slice_nums: int, multiple: int, log_ratio: float) -> tuple[int, int]:
    candidates = []
    for i in (multiple - 1, multiple, multiple + 1):
        if i == 1 or i > max_slice_nums:
            continue
        for m in range(1, i + 1):
            if i % m == 0:
                candidates.append((m, i // m))
    best, err = (1, 1), float("inf")
    for gx, gy in candidates:
        e = abs(log_ratio - math.log(gx / gy))
        if e < err:
            best, err = (gx, gy), e
    return best


def _refine_size(w: int, h: int, grid: tuple[int, int], scale_res: int,
                 patch: int) -> tuple[int, int]:
    gx, gy = grid
    rw, rh = _ensure_divide(w, gx), _ensure_divide(h, gy)
    cw, ch = _best_resize(rw // gx, rh // gy, scale_res, patch, True)
    return cw * gx, ch * gy


def get_slice_instructions(
    w: int, h: int, slice_size: int = 448, patch_size: int = 14,
    max_slice_nums: int = 9,
) -> SliceInstructions:
    has_slices = w > slice_size or h > slice_size
    overview = _best_resize(w, h, slice_size, patch_size, not has_slices)
    log_ratio = math.log(w / h)
    ratio = (w * h) / (slice_size * slice_size)
    multiple = min(math.ceil(ratio), max_slice_nums)
    grid = _best_grid(max_slice_nums, multiple, log_ratio)
    refined = _refine_size(w, h, grid, slice_size, patch_size)

    inst = SliceInstructions(overview, refined, grid, [])
    if not has_slices or max_slice_nums == 0:
        return inst
    gx, gy = grid
    sw, sh = refined[0] // gx, refined[1] // gy
    for iy in range(gy):
        for ix in range(gx):
            inst.slices.append((ix * sw, iy * sh, sw, sh))
    return inst


def _resize(img: np.ndarray, w: int, h: int, method: str) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray(img)
    res = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR}[method]
    return np.asarray(pil.resize((w, h), res))


def slice_image(
    img: np.ndarray,  # [H, W, 3] uint8
    inst: SliceInstructions,
) -> list[np.ndarray]:
    """Overview first, then refined slices (uint8 images)."""
    out = [_resize(img, *inst.overview_size, "bicubic")]
    if inst.slices:
        refined = _resize(img, *inst.refined_size, "bilinear")
        for x, y, w, h in inst.slices:
            out.append(refined[y : y + h, x : x + w])
    return out


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    """uint8 [H, W, 3] -> f32 normalized."""
    x = img.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def stack_frames(frames: list[np.ndarray]) -> np.ndarray:
    """High-refresh mode helper: merge the trailing video frames of one
    second into a single grid image (the reference flags high_refresh and
    delegates stacking to its Python server layer, omni.h:258-263; 5 fps ⇒
    frame 0 is the main image and the remaining 4 stack 2×2 here). Frames
    are resized to the first frame's size; an odd count pads with black."""
    if not frames:
        raise ValueError("stack_frames needs at least one frame")
    h, w = frames[0].shape[:2]
    cols = 2 if len(frames) > 1 else 1
    rows = -(-len(frames) // cols)
    resized = [f if f.shape[:2] == (h, w) else _resize(f, w, h, "bilinear")
               for f in frames]
    while len(resized) < rows * cols:
        resized.append(np.zeros((h, w, 3), frames[0].dtype))
    rows_img = [np.concatenate(resized[r * cols:(r + 1) * cols], axis=1)
                for r in range(rows)]
    return np.concatenate(rows_img, axis=0)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def preprocess_uhd(
    img: np.ndarray, mean, std, slice_size: int = 448, patch_size: int = 14,
    max_slice_nums: int = 9,
) -> list[np.ndarray]:
    """Full UHD pipeline: slice + normalize. Returns list of f32 [H, W, 3]."""
    inst = get_slice_instructions(img.shape[1], img.shape[0], slice_size,
                                  patch_size, max_slice_nums)
    return [normalize(s, mean, std) for s in slice_image(img, inst)]
