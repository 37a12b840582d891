"""Loss functions (pure JAX): occupancy BCE, MiDaS SSI depth loss, intrinsics loss.

Functional re-expressions of reference ``utils/loss.py`` and
``model/depth/midas_loss.py``. Dynamic boolean indexing in the reference
(e.g. ``nanmedian`` over valid pixels, ``loss[mask]=0``) becomes fixed-shape
masked arithmetic so everything jits and shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zeroshape_tpu.ops.image import max_pool2d, resize_nearest


# ---------------------------------------------------------------------------
# Shape (occupancy) loss — reference utils/loss.py:18-28
# ---------------------------------------------------------------------------

def shape_loss(pred_occ_logits, gt_sdf, impt_thres=0.01, impt_weight=1.0):
    """BCE-with-logits on occ=(sdf<0), upweighting near-surface samples.

    Args:
      pred_occ_logits: [B, N] raw logits.
      gt_sdf: [B, N] signed distances (negative inside).
    """
    assert pred_occ_logits.ndim == 2 and gt_sdf.ndim == 2
    gt_occ = (gt_sdf < 0).astype(pred_occ_logits.dtype)
    # numerically-stable BCE with logits
    x = pred_occ_logits
    loss = jnp.maximum(x, 0) - x * gt_occ + jnp.log1p(jnp.exp(-jnp.abs(x)))
    weight = jnp.where(jnp.abs(gt_sdf) < impt_thres, impt_weight, 1.0)
    return jnp.mean(loss * weight)


# ---------------------------------------------------------------------------
# Intrinsics loss — reference utils/loss.py:36-42
# ---------------------------------------------------------------------------

def intr_loss(seen_pred, seen_gt, mask):
    """Masked MSE between predicted/GT normalized visible surfaces.

    seen_pred/seen_gt: [B, HW, 3]; mask: [B, HW].
    """
    distance = jnp.sum((seen_pred - seen_gt) ** 2, axis=-1)
    return jnp.sum(distance * mask) / (jnp.sum(mask) + 1e-8)


# ---------------------------------------------------------------------------
# MiDaS scale-shift-invariant depth loss — reference model/depth/midas_loss.py
# ---------------------------------------------------------------------------

def _masked_median_sort(x_flat, mask_flat):
    """Lower median via full sort (the straightforward formulation)."""
    big = jnp.asarray(jnp.finfo(x_flat.dtype).max, x_flat.dtype)
    x_m = jnp.where(mask_flat, x_flat, big)
    x_sorted = jnp.sort(x_m, axis=-1)
    count = jnp.sum(mask_flat, axis=-1).astype(jnp.int32)  # [B]
    idx = jnp.maximum((count - 1) // 2, 0)
    med = jnp.take_along_axis(x_sorted, idx[:, None], axis=-1)[:, 0]
    return jnp.where(count > 0, med, 0.0)


def _masked_median(x_flat, mask_flat):
    """Lower median of masked elements per row; 0 when the row is empty.

    x_flat, mask_flat: [B, N] (fp32 values). Matches torch.nanmedian's
    lower-median choice, EXACTLY (returns an element of the row).

    TPU-shape of the selection: instead of a full per-row sort (XLA's TPU
    sort is a many-pass bitonic network — the single most expensive op in
    the MiDaS loss), the k-th smallest element is found by a 32-step binary
    search over the IEEE-754 bit space. Float order embeds into uint32 order
    via the standard sign-fold (non-negatives: set the top bit; negatives:
    bitwise NOT), so each step is one masked compare+count over the row —
    32 sequential elementwise passes instead of hundreds of shuffle passes,
    and the backward is free (the median is piecewise-constant in all but
    one element; gradients flow through the `==`-gather below).
    """
    x32 = x_flat.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(x32, jnp.int32)
    key = jnp.where(u < 0, ~u, u ^ jnp.int32(-(2**31)))
    key = jax.lax.bitcast_convert_type(key, jnp.uint32)
    key = jnp.where(mask_flat, key, jnp.uint32(0xFFFFFFFF))  # invalid -> top
    count = jnp.sum(mask_flat, axis=-1).astype(jnp.int32)  # [B]
    k = jnp.maximum((count - 1) // 2, 0)  # lower-median rank

    def step(carry, _):
        lo, hi = carry  # [B] uint32, invariant lo <= answer <= hi
        mid = lo + (hi - lo) // 2
        c = jnp.sum((key <= mid[:, None]).astype(jnp.int32), axis=-1)
        left = c >= k + 1
        return (jnp.where(left, lo, mid + 1), jnp.where(left, mid, hi)), None

    B = x_flat.shape[0]
    lo0 = jnp.zeros((B,), jnp.uint32)
    hi0 = jnp.full((B,), 0xFFFFFFFF, jnp.uint32)
    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), None, length=32)
    med_key = jax.lax.bitcast_convert_type(hi, jnp.int32)
    u_med = jnp.where(med_key < 0, med_key ^ jnp.int32(-(2**31)), ~med_key)
    med = jax.lax.bitcast_convert_type(u_med, jnp.float32)
    med = jax.lax.stop_gradient(med)
    # route the gradient through the selected element (the median is an
    # actual row element; ties share the subgradient like a masked mean)
    is_med = mask_flat & (x32 == med[:, None])
    n_med = jnp.maximum(jnp.sum(is_med, axis=-1), 1)
    med_grad = jnp.sum(jnp.where(is_med, x32, 0.0), axis=-1) / n_med
    med = med_grad + jax.lax.stop_gradient(med - med_grad)
    return jnp.where(count > 0, med, 0.0).astype(x_flat.dtype)


def masked_shift_and_scale(depth_pred, depth_gt, mask_valid):
    """Median/MAD alignment of both maps (midas_loss.py:34-61).

    All inputs [B, 1, H, W] (mask boolean). Returns aligned (pred, gt).
    """
    B = depth_pred.shape[0]
    flat = lambda t: t.reshape(B, -1)
    m = flat(mask_valid)
    # note: reference divides by (#valid + 1), keep that exactly
    mask_diff = jnp.sum(m, axis=-1) + 1.0  # [B]

    def align(d):
        d_f = flat(d)
        t = _masked_median(d_f, m > 0)  # [B]
        diff = jnp.abs(d_f - t[:, None]) * (m > 0)
        s = jnp.sum(diff, axis=-1) / mask_diff  # [B]
        return (d - t[:, None, None, None]) / (s[:, None, None, None] + 1e-6)

    return align(depth_pred), align(depth_gt)


def masked_l1_loss(pred, target, mask_valid):
    elt = jnp.abs(pred - target) * mask_valid
    return jnp.sum(elt) / (jnp.sum(mask_valid) + 1e-6)


def compute_scale_and_shift(prediction, target, mask, det_eps=1e-6):
    """Least-squares per-image scale/shift: min ||s*pred + t - target||^2_mask.

    prediction/target/mask: [B, H, W]. Returns (scale [B], shift [B]).
    """
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / (det + det_eps), 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / (det + det_eps), 0.0)
    return x_0, x_1


def _gradient_loss_single_scale(diff_masked, mask):
    """Sum of masked x/y gradient magnitudes per image.

    diff_masked: [B, H, W] already multiplied by mask; mask: [B, H, W].
    Returns (image_loss [B], M [B]).
    """
    grad_x = jnp.abs(diff_masked[:, :, 1:] - diff_masked[:, :, :-1])
    mask_x = mask[:, :, 1:] * mask[:, :, :-1]
    grad_y = jnp.abs(diff_masked[:, 1:, :] - diff_masked[:, :-1, :])
    mask_y = mask[:, 1:, :] * mask[:, :-1, :]
    image_loss = jnp.sum(mask_x * grad_x, axis=(1, 2)) + jnp.sum(mask_y * grad_y, axis=(1, 2))
    M = jnp.sum(mask, axis=(1, 2))
    return image_loss, M


def gradient_matching_term(prediction, target, mask, scales=4, reduction="image-based"):
    """Multi-scale gradient matching (midas_loss.py:119-139)."""
    total = 0.0
    for scale in range(scales):
        step = 2**scale
        p = prediction[:, ::step, ::step]
        t = target[:, ::step, ::step]
        m = mask[:, ::step, ::step]
        diff = m * (p - t)
        image_loss, M = _gradient_loss_single_scale(diff, m)
        if reduction == "batch-based":
            divisor = jnp.sum(M)
            total = total + jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1.0))
        else:  # image-based
            per_img = jnp.where(M > 0, image_loss / jnp.maximum(M, 1.0), image_loss)
            total = total + jnp.mean(per_img)
    return total


def erode_mask(mask, max_pool_size=4):
    """Shrink the valid region: a pixel stays valid only if its whole
    max_pool_size x max_pool_size cell is valid (midas_loss.py:153-162).

    mask: [B, 1, H, W] -> boolean same shape.
    """
    B, _, H, W = mask.shape
    inv = 1.0 - mask.astype(jnp.float32)
    inv_nhwc = jnp.transpose(inv, (0, 2, 3, 1))
    pooled = max_pool2d(inv_nhwc, max_pool_size)
    up = resize_nearest(pooled, (H, W))
    return jnp.transpose(up == 0, (0, 3, 1, 2))


def midas_loss(
    pred_raw,
    target_raw,
    mask_raw,
    alpha=0.1,
    scales=4,
    reduction="image-based",
    inverse_depth=True,
    shrink_mask=False,
):
    """SSI-MAE + alpha * multiscale gradient matching (midas_loss.py:142-185).

    pred_raw/target_raw/mask_raw: [B, 1, H, W].
    """
    if shrink_mask:
        mask = erode_mask(mask_raw).astype(jnp.float32)
    else:
        mask = (mask_raw > 0.5).astype(jnp.float32)
    pred_aligned, gt_aligned = masked_shift_and_scale(pred_raw, target_raw, mask)
    ssi = masked_l1_loss(pred_aligned, gt_aligned, mask)
    if alpha <= 0:
        return ssi
    if inverse_depth:
        prediction = 1.0 / (pred_raw[:, 0] + 1e-6)
        target = 1.0 / (target_raw[:, 0] + 1e-6)
    else:
        prediction = pred_raw[:, 0]
        target = target_raw[:, 0]
    m2 = mask[:, 0]
    scale, shift = compute_scale_and_shift(prediction, target, m2)
    prediction_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    reg = gradient_matching_term(prediction_ssi, target, m2, scales=scales, reduction=reduction)
    return ssi + alpha * reg


def depth_loss(pred_depth, gt_depth, mask, grad_reg=0.1, depth_inv=True, mask_shrink=False):
    """Reference Loss.depth_loss (utils/loss.py:30-34)."""
    assert pred_depth.ndim == gt_depth.ndim == mask.ndim == 4
    return midas_loss(
        pred_depth,
        gt_depth,
        mask,
        alpha=grad_reg,
        inverse_depth=depth_inv,
        shrink_mask=mask_shrink,
    )


def summarize_loss(loss_dict, loss_weights):
    """Weighted sum of loss terms; mirrors shape_engine.py:320-331."""
    total = 0.0
    for key, value in loss_dict.items():
        w = loss_weights.get(key)
        if w is not None:
            total = total + float(w) * jnp.mean(value)
    return total
