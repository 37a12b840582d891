"""Image resampling ops with exact torch interpolation semantics.

The DPT fusion path and depth losses depend on torch's two bilinear variants:
``align_corners=True`` (DPT fusion upsample, reference model/depth/blocks.py:336-338)
and ``align_corners=False`` (pos-embed resize, reference model/depth/vit.py:110).
``jax.image.resize`` only implements half-pixel centers, so we build explicit
per-axis interpolation matrices instead. Because shapes are static under jit,
the weight matrices are compile-time constants and each resize lowers to two
small matmuls on the MXU — faster than gather-based resampling on TPU.

All image tensors here are NHWC (TPU-native layout).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=128)
def _linear_resize_matrix(in_size: int, out_size: int, align_corners: bool):
    """[out_size, in_size] row-stochastic linear interpolation matrix."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    for o in range(out_size):
        if align_corners:
            src = o * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (o + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        W[o, lo] += 1.0 - frac
        W[o, hi] += frac
    return W


def resize_bilinear(x, out_hw, align_corners=False):
    """Bilinear resize of NHWC ``x`` to ``out_hw`` with torch semantics."""
    out_h, out_w = out_hw
    _, in_h, in_w, _ = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    Wh = jnp.asarray(_linear_resize_matrix(in_h, out_h, align_corners))
    Ww = jnp.asarray(_linear_resize_matrix(in_w, out_w, align_corners))
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = jnp.einsum("oh,bhwc->bowc", Wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", Ww, x)
    return x.astype(dtype)


def resize_nearest(x, out_hw):
    """Nearest resize of NHWC ``x`` (torch 'nearest': floor(dst*scale))."""
    out_h, out_w = out_hw
    _, in_h, in_w, _ = x.shape
    idx_h = np.floor(np.arange(out_h) * (in_h / out_h)).astype(np.int32)
    idx_w = np.floor(np.arange(out_w) * (in_w / out_w)).astype(np.int32)
    return x[:, idx_h][:, :, idx_w]


def upsample2x(x, align_corners=True):
    """2x bilinear upsample (the DPT fusion-block step)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


def adaptive_avg_pool_11(x):
    """NHWC global average pool to [B, C]."""
    return jnp.mean(x, axis=(1, 2))


def max_pool2d(x, kernel, stride=None):
    """NHWC max pool (used by the midas loss mask erosion)."""
    import jax.lax as lax

    stride = stride or kernel
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def interpolate_coordmap(coord_map, mask_map, out_hw):
    """Masked bilinear downsample of a coordinate map (+ mask).

    Equivalent of reference utils/util.py:336-345: the coord map is multiplied
    by the mask, area-resized, then renormalized by the resized mask so invalid
    pixels don't bleed in. Identity when shapes already match (dsp=1 path).

    Args:
      coord_map: [B, H, W, 3]; mask_map: [B, H, W, 1].
    Returns:
      (coord_dsp, mask_dsp) at out_hw; mask binarized at 0.5.
    """
    _, h, w, _ = coord_map.shape
    if (h, w) == tuple(out_hw):
        return coord_map, mask_map
    masked = coord_map * mask_map
    num = resize_bilinear(masked, out_hw, align_corners=False)
    den = resize_bilinear(mask_map, out_hw, align_corners=False)
    coord_dsp = num / jnp.maximum(den, 1e-6)
    mask_dsp = (den > 0.5).astype(mask_map.dtype)
    return coord_dsp * mask_dsp, mask_dsp
