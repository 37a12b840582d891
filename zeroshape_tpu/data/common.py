"""Shared image utilities for dataset loaders (numpy/PIL/cv2, NHWC)."""

from __future__ import annotations

import numpy as np
import PIL.Image

from zeroshape_tpu.data import native


def load_rgb(path: str, out_hw=None) -> np.ndarray:
    """float32 [H, W, 3] in [0, 1]. Uses the native C++ decoder when the
    image is already at target size (the *_processed dataset layouts);
    falls back to PIL (and PIL's resampling) otherwise."""
    # PIL.Image.open is lazy — .size parses only the header, so this probe
    # costs microseconds (the native zsdl_image_size does a full decode,
    # which would make the fast path decode every image twice)
    img = PIL.Image.open(path)
    if native.available():
        size_wh = img.size  # (W, H)
        if out_hw is None or (size_wh[1], size_wh[0]) == tuple(out_hw):
            out = native.decode_image(path, (size_wh[1], size_wh[0]), channels=3)
            if out is not None:
                img.close()
                return out
    img = img.convert("RGB")
    if out_hw is not None and img.size != (out_hw[1], out_hw[0]):
        img = img.resize((out_hw[1], out_hw[0]))
    return to_float_chw_free(img)


def load_npy_f32(path: str) -> np.ndarray:
    """float32 .npy load through the native reader when available."""
    if native.available():
        out = native.load_npy(path)
        if out is not None:
            return out
    return np.load(path).astype(np.float32)


def to_float_chw_free(image: "PIL.Image.Image") -> np.ndarray:
    """PIL -> float32 HWC in [0, 1] (torchvision to_tensor, but NHWC)."""
    arr = np.asarray(image, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def get_1d_bounds(arr):
    nz = np.flatnonzero(arr)
    return nz[0], nz[-1]


def get_bbox_from_mask(mask: np.ndarray, thr: float = 0.5, min_pixels: int = 10):
    """(x0, y0, x1, y1) tight bbox of mask > thr; None if nearly empty."""
    m = (mask > thr).astype(np.float32)
    if m.sum() <= min_pixels:
        return None
    x0, x1 = get_1d_bounds(m.sum(axis=-2))
    y0, y1 = get_1d_bounds(m.sum(axis=-1))
    return x0, y0, x1, y1


def square_crop(image: "PIL.Image.Image", bbox, crop_ratio: float = 1.0, expand: float = 1.2):
    """1.2x square crop around the bbox; out-of-bounds crops become padding
    (torchvision F.crop semantics used in reference demo.py:33-40)."""
    x1, y1, x2, y2 = bbox
    h, w = y2 - y1, x2 - x1
    yc, xc = (y1 + y2) / 2, (x1 + x2) / 2
    S = max(h, w) * expand * crop_ratio
    top, left, size = int(yc - S / 2), int(xc - S / 2), int(S)
    # pad-and-crop: build the output canvas then paste the overlapping region
    arr = np.asarray(image)
    out_shape = (size, size) + arr.shape[2:]
    out = np.zeros(out_shape, dtype=arr.dtype)
    src_y0, src_x0 = max(top, 0), max(left, 0)
    src_y1 = min(top + size, arr.shape[0])
    src_x1 = min(left + size, arr.shape[1])
    if src_y1 > src_y0 and src_x1 > src_x0:
        out[src_y0 - top : src_y1 - top, src_x0 - left : src_x1 - left] = arr[
            src_y0:src_y1, src_x0:src_x1
        ]
    return PIL.Image.fromarray(out)


def erode_mask_np(mask_hw: np.ndarray, iterations: int = 5) -> np.ndarray:
    """cv2 3x3 erosion with empty-mask backoff (reference ocrtoc.py:103-110)."""
    import cv2

    m = mask_hw.astype(np.uint8)
    while iterations > 0:
        eroded = cv2.erode(m, np.ones((3, 3), np.uint8), iterations=iterations)
        if eroded.sum() > 0:
            return eroded.astype(np.float32)
        iterations -= 1
    return m.astype(np.float32)


def fixed_intrinsics(H: int, W: int, f: float = 1.3875) -> np.ndarray:
    return np.array(
        [[f * W, 0, W / 2], [0, f * H, H / 2], [0, 0, 1]], dtype=np.float32
    )


def pose_from_Rt(Rt: np.ndarray) -> np.ndarray:
    """Reference loaders build pose = compose(R-only, t-only) (synthetic.py:136-140)."""
    pose = np.zeros((3, 4), np.float32)
    pose[:3, :3] = Rt[:3, :3]
    pose[:3, 3] = Rt[:3, 3]
    return pose
