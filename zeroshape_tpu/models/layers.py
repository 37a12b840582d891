"""Shared neural building blocks (flax.linen, NHWC, bf16-friendly).

TPU-native re-expressions of the blocks the reference pulls from timm /
torchvision / utils.layers: ViT blocks, conv-BN residual bottlenecks,
weight-standardized convs with TF-SAME padding (the ResNetV2 hybrid stem),
DropPath, and sin-cos positional embeddings. Cited reference lines mark the
behavior each block must reproduce; the implementations are original.

Conventions:
  * images are NHWC; token streams are [B, N, C].
  * ``dtype`` is the compute dtype (bf16 on TPU); params stay float32.
  * torch Conv2d(padding=k//2) == explicit symmetric padding here (never the
    string 'SAME', which XLA may pad asymmetrically for even strides).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Positional embeddings (reference utils/pos_embed.py:21-68)
# ---------------------------------------------------------------------------

def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def nerf_posenc(x, num_freqs: int, include_input: bool = True):
    """NeRF-style sin/cos frequency encoding (reference utils/layers.py:8-53)."""
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1) if include_input else enc


def nerf_posenc_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    if num_freqs <= 0:
        return input_dim
    return input_dim * (2 * num_freqs + (1 if include_input else 0))


# ---------------------------------------------------------------------------
# Small generic layers
# ---------------------------------------------------------------------------

def gelu_exact(x):
    """torch ``nn.GELU`` (exact erf form). flax ``nn.gelu`` defaults to the
    tanh approximation, which diverges from released-torch-weight
    activations at the 1e-3 level — every block that mirrors a torch GELU
    must use this instead (verified by tests/test_torch_parity.py)."""
    return nn.gelu(x, approximate=False)

def make_drop_path_mask(rng, batch: int, rate: float, dtype=jnp.float32):
    """Per-sample stochastic-depth keep mask, pre-scaled by 1/keep_prob."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (batch,)).astype(dtype)
    return mask / keep


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, mask=None):
        if self.rate == 0.0 or deterministic:
            return x
        if mask is None:
            mask = make_drop_path_mask(self.make_rng("dropout"), x.shape[0], self.rate, x.dtype)
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        return x * mask.reshape(shape)


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> act -> fc2 (timm Mlp)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = gelu_exact
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Standard multi-head self-attention (timm vision_transformer.Attention)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        q = jnp.swapaxes(q, 1, 2)  # [B, H, N, hd]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block: x += attn(LN(x)); x += mlp(LN(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn")(h)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return x


# ---------------------------------------------------------------------------
# Convolution helpers
# ---------------------------------------------------------------------------

def conv2d_pad(kernel: int) -> Sequence[Tuple[int, int]]:
    """torch Conv2d(padding=kernel//2) explicit padding."""
    p = kernel // 2
    return ((p, p), (p, p))


class Conv(nn.Module):
    """Plain conv, torch-style symmetric padding (padding = kernel//2)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    padding: Optional[Any] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else conv2d_pad(self.kernel)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class StdConvSame(nn.Module):
    """Weight-standardized conv with TF-SAME padding.

    Matches timm's StdConv2dSame used by the ResNetV2 stem of the hybrid ViT
    (reference model/depth/vit.py:482 pulls timm vit_base_resnet50_384):
    kernel standardized per output channel over (kh, kw, in) with eps=1e-6.
    """

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, in_ch, self.features),
            jnp.float32,
        )
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) / jnp.sqrt(var + self.eps)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def max_pool_same(x, kernel: int = 3, stride: int = 2):
    """TF-SAME max pool (timm MaxPool2dSame)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1)."""

    use_running_average: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class BottleneckConv(nn.Module):
    """conv-BN-ReLU residual bottleneck (reference utils/layers.py:76-100).

    Accepts [B, C] or [B, H, W, C]; 2D inputs are lifted to 1x1 maps.
    """

    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, None, :]
        C = x.shape[-1]
        residual = x
        out = Conv(C, self.kernel, use_bias=False, dtype=self.dtype, name="linear1")(x)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(C, self.kernel, use_bias=False, dtype=self.dtype, name="linear2")(out)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out + residual)
        if squeeze:
            out = out[:, 0, 0, :]
        return out


class BottleneckLinear(nn.Module):
    """x + fc2(gelu(fc1(LN(x)))) (reference utils/layers.py:64-74)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        h = nn.Dense(C, dtype=self.dtype, name="linear1")(h)
        h = gelu_exact(h)
        h = nn.Dense(C, dtype=self.dtype, name="linear2")(h)
        return x + h


def softplus_beta(x, beta: float = 100.0):
    """torch Softplus(beta): log(1 + exp(beta x)) / beta, linear above 20/beta."""
    return jnp.where(x * beta > 20.0, x, jax.nn.softplus(x * beta) / beta)


class CLIPFusionBlockConcat(nn.Module):
    """Fuse semantic tokens with a global CLIP latent by concat-projection
    (reference utils/layers.py:102-122; unused in shipped configs, kept for
    the extension surface)."""

    n_layers: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sem_latent, clip_latent):
        # sem_latent [B, N, C], clip_latent [B, C]
        C = sem_latent.shape[-1]
        clip = jnp.broadcast_to(clip_latent[:, None, :], sem_latent.shape)
        h = jnp.concatenate([sem_latent, clip], axis=-1)
        for i in range(self.n_layers):
            h = BottleneckLinear(dtype=self.dtype, name=f"bottleneck{i}")(h)
        h = nn.Dense(C, dtype=self.dtype, name="proj")(h)
        return gelu_exact(h) if self.act else h


class CLIPFusionBlockAttn(nn.Module):
    """Fuse via joint attention blocks, CLIP token first
    (reference utils/layers.py:124-147)."""

    n_layers: int = 1
    num_heads: int = 8
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sem_latent, clip_latent):
        h = jnp.concatenate([clip_latent[:, None, :], sem_latent], axis=1)
        for i in range(self.n_layers):
            h = ViTBlock(
                self.num_heads, 4.0, qkv_bias=True, drop_path=0.1,
                dtype=self.dtype, name=f"block{i}",
            )(h, deterministic=True)
        out = h[:, 1:, :]
        return gelu_exact(out) if self.act else out
