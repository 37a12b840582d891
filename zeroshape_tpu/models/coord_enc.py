"""Visible-surface (coordinate map) encoders.

Turns the normalized view-centric coordinate map into 1 global + N local
latent tokens. Two variants, mirroring the reference:

  * :class:`CoordEncRes` (default config) — a ResNet-50 on the masked 3ch
    coordinate map; global token from the pooled trunk through two conv
    bottlenecks + linear, local tokens from the layer3 (stride 16) features
    through two conv bottlenecks + 1x1 conv (reference
    model/shape/seen_coord_enc.py:141-194). The reference taps layer3 with a
    forward hook; here the trunk returns its stage features directly.
  * :class:`CoordEncAtt` — windowed-attention patch embedding + ViT trunk
    (seen_coord_enc.py:13-139); selectable via arch.depth.encoder.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from zeroshape_tpu.models.layers import (
    BottleneckConv,
    ViTBlock,
    get_2d_sincos_pos_embed,
)
from zeroshape_tpu.models.resnet import ResNet50


class CoordEncRes(nn.Module):
    """ResNet-50 coordinate encoder -> [B, 1 + (H/ws)*(W/ws), latent_dim]."""

    latent_dim: int = 256
    win_size: int = 16  # 16 -> tap layer3 (1024ch); 32 -> tap layer4 (2048ch)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coord_map, mask_map, train: bool = False):
        # coord_map [B, H, W, 3], mask_map [B, H, W, 1]
        B = coord_map.shape[0]
        x = coord_map * mask_map.astype(coord_map.dtype)
        feats, pooled = ResNet50(dtype=self.dtype, name="encoder")(x, train)

        # global token: pooled -> 2x BottleneckConv(2048) -> Linear(latent)
        g = BottleneckConv(dtype=self.dtype, name="fc_bottleneck1")(pooled, train)
        g = BottleneckConv(dtype=self.dtype, name="fc_bottleneck2")(g, train)
        g = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_linear")(g)

        # local tokens from the stride-(win_size) stage
        tap = feats["layer3"] if self.win_size == 16 else feats["layer4"]
        l = BottleneckConv(dtype=self.dtype, name="feat_bottleneck1")(tap, train)
        l = BottleneckConv(dtype=self.dtype, name="feat_bottleneck2")(l, train)
        l = nn.Conv(self.latent_dim, (1, 1), dtype=self.dtype, name="feat_proj")(l)
        l = l.reshape(B, -1, self.latent_dim)
        return jnp.concatenate([g[:, None, :], l], axis=1)


class CoordEmb(nn.Module):
    """Window-attention patch embedding: each window -> one CLS token."""

    embed_dim: int
    win_size: int = 8
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coord_map, mask, deterministic: bool = True):
        # coord_map [B, H, W, 3], mask [B, H, W] boolean
        B, H, W, _ = coord_map.shape
        ws = self.win_size
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="pos_embed")(coord_map)
        invalid_token = self.param(
            "invalid_coord_token", nn.initializers.normal(0.02), (self.embed_dim,), jnp.float32
        )
        m = mask[..., None].astype(emb.dtype)
        emb = emb * m + invalid_token.astype(emb.dtype) * (1.0 - m)

        # [B * H/ws * W/ws, ws*ws, C]
        emb = emb.reshape(B, H // ws, ws, W // ws, ws, self.embed_dim)
        emb = emb.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, self.embed_dim)

        two_d = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dim, ws, cls_token=True))
        emb = emb + two_d[None, 1:, :].astype(emb.dtype)
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim), jnp.float32
        )
        cls = (cls_token + two_d[None, :1, :]).astype(emb.dtype)
        emb = jnp.concatenate([jnp.broadcast_to(cls, (emb.shape[0], 1, self.embed_dim)), emb], axis=1)
        emb = ViTBlock(self.num_heads, 2.0, qkv_bias=True, dtype=self.dtype, name="block0")(
            emb, deterministic
        )
        return emb[:, 0].reshape(B, (H // ws) * (W // ws), self.embed_dim)


class CoordEncAtt(nn.Module):
    """Transformer visible-surface encoder (seen_coord_enc.py:80-139)."""

    embed_dim: int = 768
    n_blocks: int = 12
    num_heads: int = 12
    win_size: int = 8
    drop_path: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coord_map, mask, deterministic: bool = True):
        emb = CoordEmb(self.embed_dim, self.win_size, self.num_heads, dtype=self.dtype, name="coord_embed")(
            coord_map, mask, deterministic
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim), jnp.float32
        )
        cls = jnp.broadcast_to(cls_token.astype(emb.dtype), (emb.shape[0], 1, self.embed_dim))
        emb = jnp.concatenate([cls, emb], axis=1)
        for i in range(self.n_blocks):
            emb = ViTBlock(
                self.num_heads, 4.0, qkv_bias=True, drop_path=self.drop_path,
                dtype=self.dtype, name=f"block{i}",
            )(emb, deterministic)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(emb)
