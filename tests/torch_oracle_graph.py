"""Full-graph torch oracles — TEST FIXTURE ONLY.

End-to-end re-derivations of the reference compute graphs in torch, composed
from the component oracles (tests/torch_oracle_dpt.py, torch_oracle_shape.py):

- ``ShapeGraphOracle`` — reference ``model/compute_graph/graph_shape.py:115-202``:
  DPT depth + intrinsics head -> intr_param2mtx -> unproject/unit-sphere
  normalize -> coordinate encoder -> GT no-grad supervision block -> implicit
  occupancy decoder -> loss dict (shape BCE + MiDaS depth + intr MSE).
- ``DepthGraphOracle`` — reference ``graph_depth.py:61-105``.

The camera math and losses are independent torch reimplementations of the
reference semantics (utils/camera.py:52-108, utils/loss.py:8-42,
model/depth/midas_loss.py) — including the per-sample python loop of
``valid_norm_fac`` (camera.py:63-73) and torch.nanmedian's lower-median
convention — so the parity test checks our vectorized fixed-shape JAX
versions against the dynamic-shape originals. Not product code.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_oracle_dpt import DPTDepthOracle
from torch_oracle_shape import CoordEncResOracle, ImplicitOracle, IntrHeadOracle

FOCAL_BASE = 1.3875  # reference graph_shape.py:98


# ---------------------------------------------------------------------------
# camera math (reference utils/camera.py:52-108)
# ---------------------------------------------------------------------------

def intr_param2mtx_t(intr_params, H, W):
    B = intr_params.shape[0]
    scale_f = torch.pow(4.0, torch.tanh(intr_params[:, 0]))
    fx = FOCAL_BASE * W * scale_f
    fy = FOCAL_BASE * H * scale_f
    cx = W / 2.0 + torch.tanh(intr_params[:, 1]) * W / 2.0
    cy = H / 2.0 + torch.tanh(intr_params[:, 2]) * H / 2.0
    K = torch.zeros(B, 3, 3)
    K[:, 0, 0], K[:, 0, 2] = fx, cx
    K[:, 1, 1], K[:, 1, 2] = fy, cy
    K[:, 2, 2] = 1.0
    return K


def unproj_depth_t(depth, intr):
    """depth [B, H, W], intr [B, 3, 3] -> camera-frame points [B, HW, 3]."""
    B, H, W = depth.shape
    y, x = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    pix = torch.stack([x, y, torch.ones_like(x)], dim=-1).reshape(-1, 3)  # [HW, 3]
    K_inv = torch.linalg.inv(intr)
    rays = torch.einsum("nk,bjk->bnj", pix, K_inv)
    return rays * depth.reshape(B, H * W, 1)


def valid_norm_fac_t(seen_points, mask):
    """Per-sample python loop, like the reference (camera.py:63-73)."""
    means, scales = [], []
    for b in range(seen_points.shape[0]):
        valid = seen_points[b][mask[b] > 0.5]  # [n_valid, 3] dynamic
        mean = valid.mean(dim=0)
        dist = (valid - mean).norm(dim=-1)
        means.append(mean)
        scales.append(dist.max())
    return torch.stack(means), torch.stack(scales)


def normalize_seen_t(seen_points, mask):
    mean, scale = valid_norm_fac_t(seen_points, mask)
    out = (seen_points - mean[:, None, :]) / scale[:, None, None]
    return out * (mask > 0.5).float()[..., None], mean, scale


# ---------------------------------------------------------------------------
# losses (reference utils/loss.py, model/depth/midas_loss.py)
# ---------------------------------------------------------------------------

def shape_loss_t(logits, sdf, impt_thres=0.01, impt_weight=1.0):
    gt_occ = (sdf < 0).float()
    loss = F.binary_cross_entropy_with_logits(logits, gt_occ, reduction="none")
    weight = torch.where(
        sdf.abs() < impt_thres, torch.full_like(sdf, impt_weight),
        torch.ones_like(sdf),
    )
    return (loss * weight).mean()


def intr_loss_t(seen_pred, seen_gt, mask):
    distance = ((seen_pred - seen_gt) ** 2).sum(dim=-1)
    return (distance * mask).sum() / (mask.sum() + 1e-8)


def _masked_shift_scale_t(depth, mask):
    """Median/MAD alignment with nan-median over invalid (midas_loss.py:34-61)."""
    B = depth.shape[0]
    d = depth.reshape(B, -1).clone()
    m = mask.reshape(B, -1)
    d[m <= 0] = float("nan")
    t = d.nanmedian(dim=-1).values  # lower median, nan-skipping
    diff = (d - t[:, None]).abs()
    diff[m <= 0] = 0.0
    s = torch.nansum(diff, dim=-1) / (m.sum(dim=-1) + 1.0)  # the +1 divisor
    return (depth - t[:, None, None, None]) / (s[:, None, None, None] + 1e-6)


def _lsq_scale_shift_t(pred, target, mask):
    a_00 = (mask * pred * pred).sum(dim=(1, 2))
    a_01 = (mask * pred).sum(dim=(1, 2))
    a_11 = mask.sum(dim=(1, 2))
    b_0 = (mask * pred * target).sum(dim=(1, 2))
    b_1 = (mask * target).sum(dim=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    x_0 = torch.where(det != 0, (a_11 * b_0 - a_01 * b_1) / (det + 1e-6),
                      torch.zeros_like(det))
    x_1 = torch.where(det != 0, (-a_01 * b_0 + a_00 * b_1) / (det + 1e-6),
                      torch.zeros_like(det))
    return x_0, x_1


def _gradient_term_t(pred, target, mask, scales=4):
    total = 0.0
    for scale in range(scales):
        step = 2**scale
        p, t, m = pred[:, ::step, ::step], target[:, ::step, ::step], mask[:, ::step, ::step]
        diff = m * (p - t)
        gx = (diff[:, :, 1:] - diff[:, :, :-1]).abs()
        mx = m[:, :, 1:] * m[:, :, :-1]
        gy = (diff[:, 1:, :] - diff[:, :-1, :]).abs()
        my = m[:, 1:, :] * m[:, :-1, :]
        image_loss = (mx * gx).sum(dim=(1, 2)) + (my * gy).sum(dim=(1, 2))
        M = m.sum(dim=(1, 2))
        per_img = torch.where(M > 0, image_loss / M.clamp(min=1.0), image_loss)
        total = total + per_img.mean()
    return total


def midas_loss_t(pred, target, mask, alpha=0.1, inverse_depth=True):
    """SSI-MAE + alpha * multiscale gradient matching (midas_loss.py:142-185).
    All inputs [B, 1, H, W]."""
    m = (mask > 0.5).float()
    pred_al = _masked_shift_scale_t(pred, m)
    gt_al = _masked_shift_scale_t(target, m)
    ssi = ((pred_al - gt_al).abs() * m).sum() / (m.sum() + 1e-6)
    if alpha <= 0:
        return ssi
    if inverse_depth:
        prediction = 1.0 / (pred[:, 0] + 1e-6)
        tgt = 1.0 / (target[:, 0] + 1e-6)
    else:
        prediction, tgt = pred[:, 0], target[:, 0]
    m2 = m[:, 0]
    scale, shift = _lsq_scale_shift_t(prediction, tgt, m2)
    pred_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    return ssi + alpha * _gradient_term_t(pred_ssi, tgt, m2)


# ---------------------------------------------------------------------------
# full graphs
# ---------------------------------------------------------------------------

class ShapeGraphOracle(nn.Module):
    """Reference graph_shape.Graph with the released state-dict key layout."""

    def __init__(self, H=64, W=64):
        super().__init__()
        self.H, self.W = H, W
        self.dpt_depth = DPTDepthOracle(H=H, W=W)
        self.intr_oracle = IntrHeadOracle()  # holds intr_head + intr_proj keys
        self.coord_encoder = CoordEncResOracle()
        self.impl_network = ImplicitOracle(num_patches=(H // 16) ** 2)

    def state_dict_reference_layout(self):
        """Keys exactly as the reference Graph's state_dict would name them."""
        sd = {}
        sd.update({"dpt_depth." + k: v for k, v in self.dpt_depth.state_dict().items()})
        sd.update({k: v for k, v in self.intr_oracle.state_dict().items()})
        sd.update(
            {"coord_encoder." + k: v for k, v in self.coord_encoder.state_dict().items()}
        )
        sd.update(
            {"impl_network." + k: v for k, v in self.impl_network.state_dict().items()}
        )
        return sd

    def forward(self, rgb, mask, depth_gt, intr_gt, pose_gt, gt_points, gt_sdf):
        """All image tensors NCHW; returns the reference var/loss dicts."""
        B = rgb.shape[0]
        out = {}
        depth_pred, intr_feat = self.dpt_depth(rgb)
        out["depth_pred"] = depth_pred
        intr_params = self.intr_oracle(intr_feat)
        out["intr_pred"] = intr_param2mtx_t(intr_params, self.H, self.W)

        validity = (mask > 0.5).reshape(B, -1).float()
        seen = unproj_depth_t(depth_pred[:, 0], out["intr_pred"])
        seen_n, _, _ = normalize_seen_t(seen, validity)
        out["seen_points"] = seen_n

        seen_map = seen_n.reshape(B, self.H, self.W, 3).permute(0, 3, 1, 2)
        latent = self.coord_encoder(seen_map, (mask > 0.5).float())
        out["latent_depth"] = latent

        # GT no-grad block (graph_shape.py:155-182)
        with torch.no_grad():
            seen_gt = unproj_depth_t(depth_gt[:, 0], intr_gt)
            seen_gt_n, mean_gt, scale_gt = normalize_seen_t(seen_gt, validity)
            out["seen_points_gt"] = seen_gt_n
            R_gt, T_gt = pose_gt[..., :3], pose_gt[..., 3:]
            pts_cam = torch.einsum("bij,bnj->bni", R_gt, gt_points) + T_gt[..., 0][:, None, :]
            gt_points_cam = (pts_cam - mean_gt[:, None, :]) / scale_gt[:, None, None]
            out["gt_points_cam"] = gt_points_cam

        occ, attn = self.impl_network(latent, gt_points_cam)
        out["pred_sample_occ"] = occ
        out["attn"] = attn

        loss = {
            "depth": midas_loss_t(depth_pred, depth_gt, mask, alpha=0.1),
            "intr": intr_loss_t(seen_n, seen_gt_n, validity),
            "shape": shape_loss_t(occ, gt_sdf),
        }
        return out, loss


class DepthGraphOracle(nn.Module):
    """Reference graph_depth.Graph (graph_depth.py:61-105), intr head on."""

    def __init__(self, H=64, W=64):
        super().__init__()
        self.H, self.W = H, W
        self.dpt_depth = DPTDepthOracle(H=H, W=W)
        self.intr_oracle = IntrHeadOracle()

    def forward(self, rgb, mask, depth_gt, intr_gt):
        B = rgb.shape[0]
        out = {}
        depth_pred, intr_feat = self.dpt_depth(rgb)
        out["depth_pred"] = depth_pred
        intr_params = self.intr_oracle(intr_feat)
        out["intr_pred"] = intr_param2mtx_t(intr_params, self.H, self.W)

        validity = (mask > 0.5).reshape(B, -1).float()
        seen_pred = unproj_depth_t(depth_pred[:, 0], out["intr_pred"])
        out["seen_points_pred"], _, _ = normalize_seen_t(seen_pred, validity)
        seen_gt = unproj_depth_t(depth_gt[:, 0], intr_gt)
        out["seen_points_gt"], _, _ = normalize_seen_t(seen_gt, validity)

        loss = {
            "depth": midas_loss_t(depth_pred, depth_gt, mask, alpha=0.1),
            "intr": intr_loss_t(
                out["seen_points_pred"], out["seen_points_gt"], validity
            ),
        }
        return out, loss
