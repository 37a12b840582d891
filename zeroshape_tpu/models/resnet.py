"""ResNet backbones: classic BN ResNet-50 and ResNetV2 (GN + weight-std).

Two distinct residual families feed the reference model, both rebuilt here
natively for NHWC/TPU:

  * :class:`ResNet50` — torchvision-style (BatchNorm, stride on the 3x3,
    symmetric padding). Used by the coordinate encoder
    (reference model/shape/seen_coord_enc.py:148) which taps layer3 features.
  * :class:`ResNetV2Stem` — the timm `vit_base_resnet50_384` hybrid stem:
    weight-standardized convs with TF-SAME padding, GroupNorm(32), post-
    activation bottlenecks, stages (3, 4, 9), total stride 16. Stages 0 and 1
    are the DPT's first two feature taps (reference model/depth/vit.py:362-367).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from zeroshape_tpu.models.layers import (
    BatchNorm,
    Conv,
    StdConvSame,
    conv2d_pad,
    max_pool_same,
)


# ---------------------------------------------------------------------------
# Classic ResNet-50 (BatchNorm, v1.5: stride on conv2)
# ---------------------------------------------------------------------------

class BottleneckV1(nn.Module):
    mid: int
    out: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        short = x
        h = Conv(self.mid, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(not train, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(self.mid, 3, stride=self.stride, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(not train, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = Conv(self.out, 1, use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = BatchNorm(not train, dtype=self.dtype, name="bn3")(h)
        if x.shape[-1] != self.out or self.stride != 1:
            short = Conv(self.out, 1, stride=self.stride, use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            short = BatchNorm(not train, dtype=self.dtype, name="downsample_bn")(short)
        return nn.relu(h + short)


class ResNet50(nn.Module):
    """torchvision resnet50 trunk. Returns (layer outputs dict, pooled [B, 2048])."""

    dtype: Any = jnp.float32
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = BatchNorm(not train, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        # torch maxpool(3, stride 2, padding 1)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        import jax.lax as lax

        h = lax.reduce_window(
            h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        feats = {}
        widths = (256, 512, 1024, 2048)
        for stage, (n_blocks, width) in enumerate(zip(self.layers, widths)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = BottleneckV1(
                    mid=width // 4,
                    out=width,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(h, train)
            feats[f"layer{stage + 1}"] = h
        pooled = jnp.mean(h, axis=(1, 2))  # [B, 2048]
        return feats, pooled


# ---------------------------------------------------------------------------
# ResNetV2 hybrid stem (weight-standardized convs + GroupNorm, TF-SAME)
# ---------------------------------------------------------------------------

class GNAct(nn.Module):
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="gn")(x)
        return nn.relu(x) if self.act else x


class BottleneckV2(nn.Module):
    """timm ResNetV2 post-activation bottleneck (preact=False)."""

    out: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out // 4
        short = x
        h = StdConvSame(mid, 1, dtype=self.dtype, name="conv1")(x)
        h = GNAct(dtype=self.dtype, name="norm1")(h)
        h = StdConvSame(mid, 3, stride=self.stride, dtype=self.dtype, name="conv2")(h)
        h = GNAct(dtype=self.dtype, name="norm2")(h)
        h = StdConvSame(self.out, 1, dtype=self.dtype, name="conv3")(h)
        h = GNAct(act=False, dtype=self.dtype, name="norm3")(h)
        if x.shape[-1] != self.out or self.stride != 1:
            short = StdConvSame(self.out, 1, stride=self.stride, dtype=self.dtype, name="downsample_conv")(x)
            short = GNAct(act=False, dtype=self.dtype, name="downsample_norm")(short)
        return nn.relu(h + short)


class ResNetV2Stem(nn.Module):
    """Stages (3, 4, 9), widths (256, 512, 1024), total stride 16.

    Returns (stage0 [B, H/4, W/4, 256], stage1 [B, H/8, W/8, 512],
    final [B, H/16, W/16, 1024]).
    """

    dtype: Any = jnp.float32
    layers: Sequence[int] = (3, 4, 9)
    widths: Sequence[int] = (256, 512, 1024)

    @nn.compact
    def __call__(self, x):
        h = StdConvSame(64, 7, stride=2, dtype=self.dtype, name="stem_conv")(x)
        h = GNAct(dtype=self.dtype, name="stem_norm")(h)
        h = max_pool_same(h, 3, 2)
        taps = []
        for stage, (n_blocks, width) in enumerate(zip(self.layers, self.widths)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = BottleneckV2(
                    out=width,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage{stage}_{b}",
                )(h)
            taps.append(h)
        return taps[0], taps[1], h
