"""Optional RGB (semantic) encoders — disabled in the shipped configs but
selectable via ``arch.rgb.encoder`` (reference model/shape/rgb_enc.py).

``RGBEncRes`` reuses the ResNet-50 trunk shape of the coordinate encoder on
RGB input; ``RGBEncAtt`` is a plain ViT with fixed sin-cos positional
embeddings on patch tokens.
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


class RGBEncRes(nn.Module):
    """ResNet-50 RGB encoder -> [B, 1 + (H/ws)*(W/ws), latent_dim]."""

    latent_dim: int = 256
    win_size: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, train: bool = False):
        B = rgb.shape[0]
        feats, pooled = ResNet50(dtype=self.dtype, name="encoder")(rgb, train)
        g = BottleneckConv(dtype=self.dtype, name="fc_bottleneck1")(pooled, train)
        g = BottleneckConv(dtype=self.dtype, name="fc_bottleneck2")(g, train)
        g = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_linear")(g)
        tap = feats["layer3"] if self.win_size == 16 else feats["layer4"]
        l = BottleneckConv(dtype=self.dtype, name="feat_bottleneck1")(tap, train)
        l = BottleneckConv(dtype=self.dtype, name="feat_bottleneck2")(l, train)
        l = nn.Conv(self.latent_dim, (1, 1), dtype=self.dtype, name="feat_proj")(l)
        l = l.reshape(B, -1, self.latent_dim)
        return jnp.concatenate([g[:, None, :], l], axis=1)


class RGBEncAtt(nn.Module):
    """ViT RGB encoder with fixed sin-cos pos-embed (rgb_enc.py:13-84)."""

    img_size: int = 224
    embed_dim: int = 768
    n_blocks: int = 12
    num_heads: int = 12
    win_size: int = 16
    drop_path: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, deterministic: bool = True):
        B, H, W, _ = rgb.shape
        ws = self.win_size
        # patch embed: non-overlapping ws x ws conv
        emb = nn.Conv(
            self.embed_dim, (ws, ws), strides=(ws, ws), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(rgb)
        n_patches = (H // ws) * (W // ws)
        emb = emb.reshape(B, n_patches, self.embed_dim)
        pos = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, H // ws, cls_token=True)
        )[None]
        emb = emb + pos[:, 1:].astype(emb.dtype)
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim), jnp.float32
        )
        cls = (cls_token + pos[:, :1]).astype(emb.dtype)
        emb = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)), emb], axis=1
        )
        for i in range(self.n_blocks):
            emb = ViTBlock(
                self.num_heads, 4.0, qkv_bias=True, drop_path=self.drop_path,
                dtype=self.dtype, name=f"block{i}",
            )(emb, deterministic)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(emb)
