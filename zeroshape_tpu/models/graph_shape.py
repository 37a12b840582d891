"""Shape reconstruction compute graph (the full model, as a pure function).

Equivalent of the reference ``model/compute_graph/graph_shape.py``: DPT depth
+ intrinsics head -> unproject & unit-sphere normalize -> coordinate encoder
-> implicit occupancy decoder. The reference threads a mutable ``var`` dict
through stages; here the graph is a flax module whose ``__call__`` maps an
input batch pytree to an output pytree (no mutation), so the whole step jits,
differentiates, and shards over the data mesh axis.

Batch layout (TPU-native NHWC):
  rgb_input_map [B, H, W, 3] in [0, 1], mask_input_map [B, H, W, 1],
  depth_input_map [B, H, W, 1], intr [B, 3, 3], pose_gt [B, 3, 4],
  gt_sample_points [B, N, 3], gt_sample_sdf [B, N].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from zeroshape_tpu import camera, losses
from zeroshape_tpu.models.coord_enc import CoordEncAtt, CoordEncRes
from zeroshape_tpu.models.dpt import DPTDepthModel
from zeroshape_tpu.models.implicit import Implicit
from zeroshape_tpu.models.layers import BottleneckConv
from zeroshape_tpu.models.rgb_enc import RGBEncAtt, RGBEncRes
from zeroshape_tpu.ops.image import adaptive_avg_pool_11, interpolate_coordmap

FOCAL_BASE = 1.3875  # reference graph_shape.py:98


def intr_param2mtx(intr_params, H, W):
    """[B, 3] (scale_f, dcx, dcy) -> [B, 3, 3] intrinsics.

    Focal = 1.3875 * W * 4^tanh(p0) (range x[1/4, 4]); principal point shifted
    by tanh * half-extent (reference graph_shape.py:89-113).
    """
    B = intr_params.shape[0]
    scale_f = jnp.power(4.0, jnp.tanh(intr_params[:, 0]))
    fx = FOCAL_BASE * W * scale_f
    fy = FOCAL_BASE * H * scale_f
    cx = W / 2.0 + jnp.tanh(intr_params[:, 1]) * W / 2.0
    cy = H / 2.0 + jnp.tanh(intr_params[:, 2]) * H / 2.0
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, cx], axis=-1)
    row1 = jnp.stack([zeros, fy, cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


class IntrHead(nn.Module):
    """Two 3x3 conv bottlenecks + pool + zero-init linear -> 3 intr params."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        h = BottleneckConv(kernel=3, dtype=self.dtype, name="bottleneck1")(feat, train)
        h = BottleneckConv(kernel=3, dtype=self.dtype, name="bottleneck2")(h, train)
        h = adaptive_avg_pool_11(h)
        return nn.Dense(
            3,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(h)


class ShapeGraph(nn.Module):
    """Full single-image shape reconstruction model."""

    H: int = 224
    W: int = 224
    latent_dim: int = 256
    win_size: int = 16
    num_heads: int = 8
    depth_encoder: str = "resnet"  # 'resnet' | 'transformer'
    depth_enc_blocks: int = 12
    depth_dsp: int = 1
    rgb_encoder: Optional[str] = None  # None | 'resnet' | 'transformer'
    rgb_enc_blocks: int = 12
    impl_n_channels: int = 256
    impl_att_blocks: int = 2
    impl_mlp_layers: int = 8
    impl_mlp_ratio: float = 4.0
    impl_posenc_3D: int = 0
    impl_posenc_perlayer: bool = False
    impl_skip_in: tuple = (2, 4, 6)
    depth_head_init_scale: float = 1.0
    dtype: Any = jnp.float32

    @classmethod
    def from_opt(cls, opt, dtype=jnp.float32):
        arch = opt.arch
        return cls(
            H=opt.H,
            W=opt.W,
            latent_dim=arch.latent_dim,
            win_size=arch.win_size,
            num_heads=arch.num_heads,
            depth_encoder=arch.depth.encoder or "transformer",
            depth_enc_blocks=arch.depth.get("n_blocks", 12),
            depth_dsp=1 if arch.depth.encoder == "resnet" else arch.depth.get("dsp", 1),
            rgb_encoder=arch.rgb.encoder,
            rgb_enc_blocks=arch.rgb.get("n_blocks", 12),
            impl_n_channels=arch.impl.n_channels,
            impl_att_blocks=arch.impl.att_blocks,
            impl_mlp_layers=arch.impl.mlp_layers,
            impl_mlp_ratio=arch.impl.mlp_ratio,
            impl_posenc_3D=arch.impl.posenc_3D,
            impl_posenc_perlayer=arch.impl.posenc_perlayer,
            impl_skip_in=tuple(arch.impl.skip_in),
            depth_head_init_scale=arch.depth.get("head_init_scale", 1.0) or 1.0,
            dtype=dtype,
        )

    def setup(self):
        self.dpt_depth = DPTDepthModel(
            head_init_scale=self.depth_head_init_scale,
            dtype=self.dtype, name="dpt_depth",
        )
        self.intr_head = IntrHead(dtype=self.dtype, name="intr_head")
        if self.depth_encoder == "resnet":
            self.coord_encoder = CoordEncRes(
                latent_dim=self.latent_dim, win_size=self.win_size,
                dtype=self.dtype, name="coord_encoder",
            )
        else:
            self.coord_encoder = CoordEncAtt(
                embed_dim=self.latent_dim,
                n_blocks=self.depth_enc_blocks,
                num_heads=self.num_heads,
                win_size=self.win_size // self.depth_dsp,
                dtype=self.dtype,
                name="coord_encoder",
            )
        if self.rgb_encoder == "resnet":
            self.rgb_enc = RGBEncRes(
                latent_dim=self.latent_dim, win_size=self.win_size,
                dtype=self.dtype, name="rgb_encoder",
            )
        elif self.rgb_encoder == "transformer":
            self.rgb_enc = RGBEncAtt(
                img_size=self.H, embed_dim=self.latent_dim,
                n_blocks=self.rgb_enc_blocks, num_heads=self.num_heads,
                win_size=self.win_size, dtype=self.dtype, name="rgb_encoder",
            )
        else:
            self.rgb_enc = None
        feat_res = self.H // self.win_size
        self.impl_network = Implicit(
            num_patches=feat_res**2,
            latent_dim=self.latent_dim * 2 if self.rgb_enc else self.latent_dim,
            semantic=self.rgb_enc is not None,
            n_channels=self.impl_n_channels,
            n_blocks_attn=self.impl_att_blocks,
            n_layers_mlp=self.impl_mlp_layers,
            num_heads=self.num_heads,
            posenc_3D=self.impl_posenc_3D,
            mlp_ratio=self.impl_mlp_ratio,
            skip_in=self.impl_skip_in,
            pos_perlayer=self.impl_posenc_perlayer,
            dtype=self.dtype,
            name="impl_network",
        )

    def encode_image(self, batch, train: bool = False):
        """Image -> (latents, predictions dict). The encoder half of forward."""
        rgb = batch["rgb_input_map"]
        mask = batch["mask_input_map"]
        B = rgb.shape[0]
        out = {}

        if self.rgb_enc is None:
            out["latent_semantic"] = None
        elif self.rgb_encoder == "transformer":
            out["latent_semantic"] = self.rgb_enc(rgb, deterministic=not train)
        else:
            out["latent_semantic"] = self.rgb_enc(rgb, train)

        depth_pred, intr_feat = self.dpt_depth(rgb, deterministic=not train)
        out["depth_pred"] = depth_pred  # [B, H, W, 1]
        intr_params = self.intr_head(intr_feat, train)
        out["intr_pred"] = intr_param2mtx(intr_params.astype(jnp.float32), self.H, self.W)

        validity_mask = (mask > 0.5).reshape(B, -1).astype(jnp.float32)
        out["validity_mask"] = validity_mask

        # unproject and unit-sphere normalize the visible surface (fp32 geometry)
        seen_points = camera.unproj_depth(
            depth_pred[..., 0].astype(jnp.float32), out["intr_pred"]
        )
        seen_norm, mean, scale = camera.normalize_seen_points(seen_points, validity_mask)
        out["seen_points"] = seen_norm  # [B, HW, 3]

        seen_map = seen_norm.reshape(B, self.H, self.W, 3)
        dsp_hw = (self.H // self.depth_dsp, self.W // self.depth_dsp)
        seen_dsp, mask_dsp = interpolate_coordmap(
            seen_map, (mask > 0.5).astype(jnp.float32), dsp_hw
        )
        if self.depth_encoder == "resnet":
            out["latent_depth"] = self.coord_encoder(
                seen_dsp.astype(self.dtype), mask_dsp, train
            )
        else:
            out["latent_depth"] = self.coord_encoder(
                seen_dsp.astype(self.dtype), mask_dsp[..., 0] > 0.5, not train
            )
        return out

    def gt_supervision(self, batch):
        """GT-normalized camera-frame SDF sample points (no-grad block,
        reference graph_shape.py:155-182)."""
        mask = batch["mask_input_map"]
        B = mask.shape[0]
        validity = (mask > 0.5).reshape(B, -1).astype(jnp.float32)
        seen_gt = camera.unproj_depth(
            batch["depth_input_map"][..., 0].astype(jnp.float32), batch["intr"]
        )
        seen_gt_norm, mean_gt, scale_gt = camera.normalize_seen_points(seen_gt, validity)

        pose = batch["pose_gt"]  # [B, 3, 4]
        R_gt, T_gt = pose[..., :3], pose[..., 3:]
        pts = batch["gt_sample_points"]  # [B, N, 3]
        pts_cam = jnp.einsum("bij,bnj->bni", R_gt, pts) + T_gt[..., 0][:, None, :]
        gt_points_cam = (pts_cam - mean_gt[:, None, :]) / scale_gt[:, None, None]

        # 100 nearest-surface points for visualization
        sdf = batch["gt_sample_sdf"]
        k = min(100, sdf.shape[1])
        _, idx = jax.lax.top_k(-jnp.abs(sdf), k)
        gt_surf_points = jnp.take_along_axis(gt_points_cam, idx[..., None], axis=1)

        out = {
            "seen_points_gt": seen_gt_norm,
            "gt_points_cam": gt_points_cam,
            "gt_surf_points": gt_surf_points,
            "gt_norm_mean": mean_gt,
            "gt_norm_scale": scale_gt,
        }
        return jax.lax.stop_gradient(out)

    def __call__(self, batch, train: bool = False, with_supervision: Optional[bool] = None):
        """Full forward. Returns the prediction pytree."""
        out = self.encode_image(batch, train)
        if with_supervision is None:
            with_supervision = "gt_sample_points" in batch and "gt_sample_sdf" in batch
        if with_supervision:
            out.update(self.gt_supervision(batch))
            occ, attn = self.impl_network(
                out["latent_depth"],
                out["latent_semantic"],
                out["gt_points_cam"],
                deterministic=not train,
            )
            out["pred_sample_occ"] = occ
            out["attn"] = attn
        return out


def compute_loss(opt, batch, out, training: bool = False):
    """Loss dict (unweighted), mirroring reference graph_shape.py:194-202."""
    loss = {}
    lw = opt.loss_weight
    tr = opt.training
    if lw.get("depth") is not None:
        dl = tr.depth_loss
        loss["depth"] = losses.depth_loss(
            jnp.transpose(out["depth_pred"], (0, 3, 1, 2)),
            jnp.transpose(batch["depth_input_map"], (0, 3, 1, 2)),
            jnp.transpose(batch["mask_input_map"], (0, 3, 1, 2)),
            grad_reg=dl.grad_reg,
            depth_inv=dl.depth_inv,
            mask_shrink=dl.mask_shrink,
        )
    if lw.get("intr") is not None and training:
        loss["intr"] = losses.intr_loss(
            out["seen_points"], out["seen_points_gt"], out["validity_mask"]
        )
    if lw.get("shape") is not None and training:
        sl = tr.shape_loss
        loss["shape"] = losses.shape_loss(
            out["pred_sample_occ"],
            batch["gt_sample_sdf"],
            impt_thres=sl.impt_thres,
            impt_weight=sl.impt_weight,
        )
    return loss


def attn_geo_stats(opt, batch, out, depth_eps=0.05):
    """The four attention-statistics scalars the reference engine logs.

    The reference only has the *consumer* — ``model/shape_engine.py:537-544``
    guards on ``attn_geo_{avg,seen,occl,bg}`` being present in ``var``, but no
    code in the reference tree ever produces them (the forward discards the
    attention map, ``graph_shape.py:185``). This framework defines and
    produces them: each scalar is the mean attention mass that query points
    place on the geometry latent tokens (``attn_vis`` sums; the complement is
    the self-attention term), split by query-point type:

      avg  — all SDF query points;
      seen — queries whose reprojection through the GT intrinsics lands on a
             foreground pixel within ``depth_eps`` of the input depth (i.e.
             near the *visible* surface);
      occl — occupied queries (sdf < 0) that are not visible;
      bg   — unoccupied queries (sdf > 0).

    Returns {} when the forward carried no supervision (no attention map).
    """
    if "attn" not in out:
        return {}
    geo_mass = jnp.sum(out["attn"].astype(jnp.float32), axis=-1)  # [B, N]
    sdf = batch["gt_sample_sdf"]
    occupied = sdf < 0

    # un-normalize the queries back to the raw camera frame and reproject
    pts = (
        out["gt_points_cam"] * out["gt_norm_scale"][:, None, None]
        + out["gt_norm_mean"][:, None, :]
    )  # [B, N, 3]
    uv = camera.cam2img(pts, batch["intr"].astype(jnp.float32))  # [B, N, 3]
    z = pts[..., 2]
    u = uv[..., 0] / jnp.maximum(uv[..., 2], 1e-8)
    v = uv[..., 1] / jnp.maximum(uv[..., 2], 1e-8)
    H, W = batch["depth_input_map"].shape[1:3]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_bounds = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0)

    def gather_map(m):  # m [B, H, W, 1] -> [B, N]
        flat = m[..., 0].reshape(m.shape[0], -1)
        return jnp.take_along_axis(flat, vi * W + ui, axis=1)

    depth_at = gather_map(batch["depth_input_map"].astype(jnp.float32))
    mask_at = gather_map(batch["mask_input_map"].astype(jnp.float32))
    seen = in_bounds & (mask_at > 0.5) & (jnp.abs(z - depth_at) < depth_eps)

    def masked_mean(m):
        cnt = jnp.sum(m)
        return jnp.where(cnt > 0, jnp.sum(geo_mass * m) / jnp.maximum(cnt, 1), 0.0)

    return {
        "attn_geo_avg": jnp.mean(geo_mass),
        "attn_geo_seen": masked_mean(seen.astype(jnp.float32)),
        "attn_geo_occl": masked_mean((occupied & ~seen).astype(jnp.float32)),
        "attn_geo_bg": masked_mean((~occupied).astype(jnp.float32)),
    }
