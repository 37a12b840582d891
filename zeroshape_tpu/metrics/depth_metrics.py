"""Depth evaluation metrics after disparity-space least-squares alignment.

Functional port of the reference ``utils/eval_depth.py`` (DepthMetric): the
prediction is converted to disparity, aligned to GT disparity by per-image
scale/shift least squares, inverted back to depth, and scored with masked
delta-threshold / rmse / l1 / abs_rel metrics. All masked indexing becomes
fixed-shape arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_THRESHOLDS = (1.02, 1.05, 1.1, 1.2)


def _scale_and_shift(prediction, target, mask):
    """eval_depth.py:12-33 — note: valid requires det > 0 and no det eps."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det > 0
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


def metric_keys(thresholds=DEFAULT_THRESHOLDS):
    return [f"d>{t}" for t in thresholds] + ["rmse", "l1_err", "abs_rel"]


def compute_depth_metrics(
    prediction,
    target,
    mask,
    thresholds=DEFAULT_THRESHOLDS,
    depth_cap=None,
    prediction_type="depth",
):
    """Compute per-sample depth metrics.

    Args:
      prediction/target/mask: [B, 1, H, W] float.
    Returns:
      (metrics dict of [B] arrays, aligned prediction depth [B, 1, H, W]).
    """
    assert prediction.shape == target.shape == mask.shape and prediction.ndim == 4
    prediction = prediction[:, 0].astype(jnp.float32)
    target = target[:, 0].astype(jnp.float32)
    m = (mask[:, 0] > 0.5).astype(jnp.float32)

    if prediction_type == "depth":
        pred_disp = m * (1.0 / (prediction + 1e-6))
    elif prediction_type == "disparity":
        pred_disp = m * prediction
    else:
        raise ValueError(f"unknown prediction type {prediction_type}")
    # GT disparity only over valid pixels (avoid 1/0 on background)
    target_disp = m * (1.0 / jnp.where(m > 0, target, 1.0))

    scale, shift = _scale_and_shift(pred_disp, target_disp, m)
    pred_aligned = scale[:, None, None] * pred_disp + shift[:, None, None]
    if depth_cap is not None:
        pred_aligned = jnp.maximum(pred_aligned, 1.0 / depth_cap)

    # guard: aligned disparity can be <= 0 on invalid pixels; they are masked out
    pred_depth = 1.0 / jnp.where(pred_aligned != 0, pred_aligned, 1.0)

    n_valid = jnp.sum(m, axis=(1, 2))
    safe_n = jnp.maximum(n_valid, 1.0)
    safe_target = jnp.where(m > 0, target, 1.0)
    safe_pred = jnp.where(m > 0, pred_depth, 1.0)

    metrics = {}
    ratio = jnp.maximum(safe_pred / safe_target, safe_target / safe_pred)
    for t in thresholds:
        bad = (ratio > t).astype(jnp.float32) * m
        metrics[f"d>{t}"] = jnp.sum(bad, axis=(1, 2)) / safe_n

    sq = ((pred_depth - target) ** 2) * m
    metrics["rmse"] = jnp.sqrt(jnp.sum(sq, axis=(1, 2)) / safe_n)
    l1 = jnp.abs(pred_depth - target) * m
    metrics["l1_err"] = jnp.sum(l1, axis=(1, 2)) / safe_n
    abs_rel = (jnp.abs(pred_depth - target) / safe_target) * m
    metrics["abs_rel"] = jnp.sum(abs_rel, axis=(1, 2)) / safe_n

    return metrics, (pred_depth * m)[:, None]
