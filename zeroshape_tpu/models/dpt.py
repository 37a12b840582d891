"""DPT monocular depth stack: ResNetV2+ViT hybrid backbone and fusion decoder.

TPU-native rebuild of the reference's DPT pipeline
(model/depth/dpt_depth.py, blocks.py, vit.py). The reference taps backbone
activations through forward hooks (vit.py:362-370) and post-processes them
through `act_postprocess` Sequentials; here the backbone simply *returns* its
multi-level features — a pure-function design that XLA can fuse end-to-end.

Pipeline at 224x224 input (vitb_rn50_384 backbone, hooks [0, 1, 8, 11]):
  stage0 [B, 56, 56, 256], stage1 [B, 28, 28, 512]   (ResNetV2 taps)
  block8 / block11 tokens -> project-readout -> [B, 14, 14, 768] / stride-2
  -> per-level 3x3 "scratch" convs to 256ch -> 4 cascaded fusion blocks,
  each: residual-conv-unit + 2x bilinear upsample (align_corners=True)
  -> head conv(128) -> 2x up -> conv(32) -> relu -> conv(1) -> relu.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from zeroshape_tpu.models.layers import Conv, ViTBlock, gelu_exact
from zeroshape_tpu.models.resnet import ResNetV2Stem
from zeroshape_tpu.ops.image import resize_bilinear, upsample2x


# ---------------------------------------------------------------------------
# Hybrid backbone
# ---------------------------------------------------------------------------

class HybridViT(nn.Module):
    """ViT-B/16 over a ResNetV2-50 stem (timm vit_base_resnet50_384 semantics).

    Returns the four DPT taps: (stage0, stage1, tokens@block8, tokens@block11),
    token taps of shape [B, 1 + (H/16)(W/16), 768] including the cls token.
    The checkpoint-native pos-embed grid is 24x24 (384px training) and is
    bilinearly resized (align_corners=False, vit.py:101-115) to the runtime
    grid — a compile-time constant fold under jit.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    hooks: Sequence[int] = (8, 11)
    native_grid: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, _ = x.shape
        gs_h, gs_w = H // 16, W // 16
        stage0, stage1, feat = ResNetV2Stem(dtype=self.dtype, name="backbone")(x)
        # patch embedding: 1x1 conv over the stride-16 CNN features
        tokens = nn.Conv(
            self.embed_dim, (1, 1), use_bias=True, dtype=self.dtype, name="patch_embed_proj"
        )(feat)
        tokens = tokens.reshape(B, gs_h * gs_w, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.native_grid**2, self.embed_dim),
            jnp.float32,
        )
        pe = _resize_pos_embed(pos_embed, self.native_grid, (gs_h, gs_w))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(tokens.dtype), (B, 1, self.embed_dim)), tokens],
            axis=1,
        )
        tokens = tokens + pe.astype(tokens.dtype)

        taps = {}
        for i in range(self.depth):
            tokens = ViTBlock(
                self.num_heads, 4.0, qkv_bias=True, dtype=self.dtype, name=f"block{i}"
            )(tokens, deterministic)
            if i in self.hooks:
                taps[i] = tokens
        # final norm exists for checkpoint parity but the DPT taps are pre-norm
        _ = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return stage0, stage1, taps[self.hooks[0]], taps[self.hooks[1]]


def _resize_pos_embed(pos_embed, native_grid: int, out_grid: Tuple[int, int]):
    """Bilinear pos-embed grid resize, cls token passed through (vit.py:101-115)."""
    tok, grid = pos_embed[:, :1], pos_embed[:, 1:]
    C = pos_embed.shape[-1]
    if (native_grid, native_grid) == out_grid:
        return pos_embed
    grid = grid.reshape(1, native_grid, native_grid, C)
    grid = resize_bilinear(grid, out_grid, align_corners=False)
    grid = grid.reshape(1, out_grid[0] * out_grid[1], C)
    return jnp.concatenate([tok, grid], axis=1)


class ProjectReadout(nn.Module):
    """Fuse the cls token into every patch token: Linear([t; cls]) + GELU."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        # tokens [B, 1+N, C] with cls first
        cls = tokens[:, :1]
        patches = tokens[:, 1:]
        readout = jnp.broadcast_to(cls, patches.shape)
        h = jnp.concatenate([patches, readout], axis=-1)
        h = nn.Dense(tokens.shape[-1], dtype=self.dtype, name="project")(h)
        return gelu_exact(h)


# ---------------------------------------------------------------------------
# Fusion decoder
# ---------------------------------------------------------------------------

class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv + skip (blocks.py:232-289, bn=False variant)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.relu(x)
        h = Conv(C, 3, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = Conv(C, 3, dtype=self.dtype, name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """RCU fusion + 2x bilinear upsample (align_corners=True) + 1x1 out conv."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(dtype=self.dtype, name="res_conv_unit1")(skip)
        x = ResidualConvUnit(dtype=self.dtype, name="res_conv_unit2")(x)
        x = upsample2x(x, align_corners=True)
        return Conv(x.shape[-1], 1, dtype=self.dtype, name="out_conv")(x)


class DPT(nn.Module):
    """Backbone taps -> multi-scale reassembly -> fusion cascade -> features.

    Returns (path1 features [B, H/2, W/2, 256], layer4 [B, H/32, W/32, 768]):
    layer4 is the deepest reassembled tap, consumed by the intrinsics head
    (reference graph_shape.py:122-127 takes DPT's get_feat output).
    """

    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, _ = x.shape
        gs = (H // 16, W // 16)
        stage0, stage1, tap3, tap4 = HybridViT(dtype=self.dtype, name="pretrained")(
            x, deterministic
        )

        def tokens_to_map(tokens, name):
            t = ProjectReadout(dtype=self.dtype, name=f"{name}_readout")(tokens)
            return t.reshape(B, gs[0], gs[1], t.shape[-1])

        layer3 = tokens_to_map(tap3, "act3")
        layer3 = Conv(768, 1, dtype=self.dtype, name="act3_conv")(layer3)
        layer4 = tokens_to_map(tap4, "act4")
        layer4 = Conv(768, 1, dtype=self.dtype, name="act4_conv")(layer4)
        layer4 = Conv(768, 3, stride=2, dtype=self.dtype, name="act4_down")(layer4)

        l1 = Conv(self.features, 3, use_bias=False, dtype=self.dtype, name="layer1_rn")(stage0)
        l2 = Conv(self.features, 3, use_bias=False, dtype=self.dtype, name="layer2_rn")(stage1)
        l3 = Conv(self.features, 3, use_bias=False, dtype=self.dtype, name="layer3_rn")(layer3)
        l4 = Conv(self.features, 3, use_bias=False, dtype=self.dtype, name="layer4_rn")(layer4)

        path4 = FeatureFusionBlock(dtype=self.dtype, name="refinenet4")(l4)
        path3 = FeatureFusionBlock(dtype=self.dtype, name="refinenet3")(path4, l3)
        path2 = FeatureFusionBlock(dtype=self.dtype, name="refinenet2")(path3, l2)
        path1 = FeatureFusionBlock(dtype=self.dtype, name="refinenet1")(path2, l1)
        return path1, layer4


class DPTDepthModel(nn.Module):
    """DPT + depth head; input in [0,1] is shifted to [-1,1], output clamped [0,1].

    Reference model/depth/dpt_depth.py:96-123. Returns (depth [B, H, W, 1],
    intr_feat [B, H/32, W/32, 768]).

    ``head_init_scale`` scales the final 1x1 conv's kernel init (default 1.0 =
    the reference's untouched default init). The reference relies on
    pretrained weights, so its random head init is never exercised; trained
    from scratch, the single-channel head projects the all-positive 32-ch
    features through ONE random direction, landing the whole pre-ReLU map
    uniformly below 0 (or above 1) — the ReLU/clamp then has zero gradient
    everywhere and the depth branch is dead from step 0 (observed: MiDaS loss
    frozen at ~1.01 = SSI of any constant map). From-scratch recipes set this
    small (e.g. 0.01) so the init output sits near the +0.05 bias, inside the
    live region of ReLU∘clamp.
    """

    dtype: Any = jnp.float32
    head_init_scale: float = 1.0

    @nn.compact
    def __call__(self, image, deterministic: bool = True):
        x = image * 2.0 - 1.0
        path1, layer4 = DPT(dtype=self.dtype, name="dpt")(x, deterministic)
        h = Conv(128, 3, dtype=self.dtype, name="head_conv1")(path1)
        h = upsample2x(h, align_corners=True)
        h = Conv(32, 3, dtype=self.dtype, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(
            1, (1, 1), use_bias=True,
            kernel_init=nn.initializers.variance_scaling(
                self.head_init_scale**2, "fan_in", "truncated_normal"
            ),
            bias_init=nn.initializers.constant(0.05),
            dtype=self.dtype, name="head_conv3",
        )(h)
        h = nn.relu(h)
        depth = jnp.clip(h, 0.0, 1.0)
        return depth, layer4
