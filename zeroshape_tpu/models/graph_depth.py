"""Depth + intrinsics pretraining graph (reference model/compute_graph/graph_depth.py).

DPT depth prediction with an optional intrinsics head; when intrinsics are
supervised, both the predicted and GT visible surfaces are unprojected and
unit-sphere normalized for the intrinsics loss.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from zeroshape_tpu import camera, losses
from zeroshape_tpu.models.dpt import DPTDepthModel
from zeroshape_tpu.models.graph_shape import IntrHead, intr_param2mtx


class DepthGraph(nn.Module):
    H: int = 224
    W: int = 224
    predict_intr: bool = True
    depth_head_init_scale: float = 1.0
    dtype: Any = jnp.float32

    @classmethod
    def from_opt(cls, opt, dtype=jnp.float32):
        return cls(
            H=opt.H,
            W=opt.W,
            predict_intr=opt.loss_weight.get("intr") is not None,
            depth_head_init_scale=opt.arch.depth.get("head_init_scale", 1.0) or 1.0,
            dtype=dtype,
        )

    def setup(self):
        self.dpt_depth = DPTDepthModel(
            head_init_scale=self.depth_head_init_scale,
            dtype=self.dtype, name="dpt_depth",
        )
        if self.predict_intr:
            self.intr_head = IntrHead(dtype=self.dtype, name="intr_head")

    def __call__(self, batch, train: bool = False):
        rgb = batch["rgb_input_map"]
        mask = batch["mask_input_map"]
        B = rgb.shape[0]
        out = {}
        depth_pred, intr_feat = self.dpt_depth(rgb, deterministic=not train)
        out["depth_pred"] = depth_pred
        if not self.predict_intr:
            return out

        intr_params = self.intr_head(intr_feat, train)
        out["intr_pred"] = intr_param2mtx(intr_params.astype(jnp.float32), self.H, self.W)

        validity = (mask > 0.5).reshape(B, -1).astype(jnp.float32)
        out["validity_mask"] = validity
        seen_pred = camera.unproj_depth(
            depth_pred[..., 0].astype(jnp.float32), out["intr_pred"]
        )
        out["seen_points_pred"], _, _ = camera.normalize_seen_points(seen_pred, validity)

        if "depth_input_map" in batch:
            seen_gt = camera.unproj_depth(
                batch["depth_input_map"][..., 0].astype(jnp.float32), batch["intr"]
            )
            out["seen_points_gt"], _, _ = camera.normalize_seen_points(seen_gt, validity)
        return out


def compute_loss(opt, batch, out, training: bool = False):
    """Reference graph_depth.py:99-105 (intr loss applies in eval too)."""
    loss = {}
    lw = opt.loss_weight
    dl = opt.training.depth_loss
    if lw.get("depth") is not None:
        loss["depth"] = losses.depth_loss(
            jnp.transpose(out["depth_pred"], (0, 3, 1, 2)),
            jnp.transpose(batch["depth_input_map"], (0, 3, 1, 2)),
            jnp.transpose(batch["mask_input_map"], (0, 3, 1, 2)),
            grad_reg=dl.grad_reg,
            depth_inv=dl.depth_inv,
            mask_shrink=dl.mask_shrink,
        )
    if lw.get("intr") is not None:
        loss["intr"] = losses.intr_loss(
            out["seen_points_pred"], out["seen_points_gt"], out["validity_mask"]
        )
    return loss
