"""Torch oracles for the shape graph's non-DPT components — TEST FIXTURE ONLY.

Same purpose and ground rules as tests/torch_oracle_dpt.py: rebuild the
reference's torch module semantics (torchvision resnet50, the Bottleneck_Conv
residuals of utils/layers.py:76-100, the masked joint attention of
model/shape/implicit.py, the intrinsics head of graph_shape.py:19-28) with
the released state-dict key layout, so tests can numerically verify the flax
models + the torch->flax importer. Not product code; an independent
re-derivation for verification.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# torchvision-style ResNet-50 (BN, v1.5: stride on the 3x3)
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    def __init__(self, in_ch, mid, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        if in_ch != out_ch or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        short = self.downsample(x) if self.downsample is not None else x
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + short)


class ResNet50(nn.Module):
    """torchvision resnet50 trunk; forward returns (stage features, pooled)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch = 64
        for stage, (n_blocks, width) in enumerate(
            zip((3, 4, 6, 3), (256, 512, 1024, 2048))
        ):
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(Bottleneck(in_ch, width // 4, width, stride))
                in_ch = width
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(h, 3, stride=2, padding=1)
        feats = {}
        for stage in range(1, 5):
            h = getattr(self, f"layer{stage}")(h)
            feats[f"layer{stage}"] = h
        pooled = F.adaptive_avg_pool2d(h, 1).flatten(1)
        return feats, pooled


class BottleneckConv(nn.Module):
    """Reference utils/layers.py:76-100 Bottleneck_Conv."""

    def __init__(self, channels, kernel_size=1):
        super().__init__()
        p = kernel_size // 2
        self.linear1 = nn.Conv2d(channels, channels, kernel_size, padding=p, bias=False)
        self.bn1 = nn.BatchNorm2d(channels)
        self.linear2 = nn.Conv2d(channels, channels, kernel_size, padding=p, bias=False)
        self.bn2 = nn.BatchNorm2d(channels)

    def forward(self, x):
        squeeze = x.dim() == 2
        if squeeze:
            x = x[:, :, None, None]
        h = F.relu(self.bn1(self.linear1(x)))
        h = self.bn2(self.linear2(h))
        out = F.relu(h + x)
        return out[:, :, 0, 0] if squeeze else out


class CoordEncResOracle(nn.Module):
    """Reference model/shape/seen_coord_enc.py:141-194 (win_size=16)."""

    def __init__(self, latent_dim=256):
        super().__init__()
        self.encoder = ResNet50()
        self.encoder.fc = nn.Sequential(
            BottleneckConv(2048), BottleneckConv(2048), nn.Linear(2048, latent_dim)
        )
        self.depth_feat_proj = nn.Sequential(
            BottleneckConv(1024), BottleneckConv(1024), nn.Conv2d(1024, latent_dim, 1)
        )

    def forward(self, coord_map, mask_map):
        x = coord_map * mask_map.float()
        feats, pooled = self.encoder(x)
        g = self.encoder.fc(pooled)[:, None, :]  # [B, 1, C]
        l = self.depth_feat_proj(feats["layer3"])  # [B, C, H/16, W/16]
        l = l.flatten(2).transpose(1, 2)  # [B, N, C]
        return torch.cat([g, l], dim=1)


class IntrHeadOracle(nn.Module):
    """Reference graph_shape.py:19-28: 2x Bottleneck_Conv(768, k=3) + pool +
    zero-init (here randomized) Linear -> 3."""

    def __init__(self, channels=768):
        super().__init__()
        self.intr_head = nn.Sequential(
            BottleneckConv(channels, 3), BottleneckConv(channels, 3)
        )
        self.intr_proj = nn.Linear(channels, 3)

    def forward(self, feat):
        h = self.intr_head(feat)
        h = F.adaptive_avg_pool2d(h, 1).flatten(1)
        return self.intr_proj(h)


# ---------------------------------------------------------------------------
# Implicit decoder (reference model/shape/implicit.py)
# ---------------------------------------------------------------------------

def sincos_pos_embed(embed_dim, grid_size, cls_token=True):
    """Reference utils/pos_embed.py:21-47 (independent reimplementation)."""

    def emb_1d(pos):
        omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_w, grid_h = np.meshgrid(
        np.arange(grid_size, dtype=np.float32), np.arange(grid_size, dtype=np.float32)
    )
    pe = np.concatenate([emb_1d(grid_w), emb_1d(grid_h)], axis=1)
    if cls_token:
        pe = np.concatenate([np.zeros([1, embed_dim]), pe], axis=0)
    return pe.astype(np.float32)


class ImplBlock(nn.Module):
    def __init__(self, dim=256, heads=8, mlp_ratio=4.0, last_layer=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads
        self.last_layer = last_layer

    def _attend(self, x, n_points):
        B, N, C = x.shape
        hd = C // self.heads
        L = N - n_points
        qkv = self.attn.qkv(x).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        ql, kl, vl = q[:, :, :L], k[:, :, :L], v[:, :, :L]
        qp, kp, vp = q[:, :, L:], k[:, :, L:], v[:, :, L:]
        scale = hd**-0.5
        cross = (qp @ kl.transpose(-2, -1)) * scale
        self_w = (qp * kp).sum(-1, keepdim=True) * scale
        joint = torch.cat([cross, self_w], dim=-1).softmax(dim=-1)
        pts = (joint[..., :L] @ vl + joint[..., L:] * vp).transpose(1, 2).reshape(
            B, n_points, C
        )
        attn_vis = joint[..., :L].mean(dim=1)
        if self.last_layer:
            return self.attn.proj(pts), attn_vis
        lat_w = ((ql @ kl.transpose(-2, -1)) * scale).softmax(dim=-1)
        lat = (lat_w @ vl).transpose(1, 2).reshape(B, L, C)
        return self.attn.proj(torch.cat([lat, pts], dim=1)), attn_vis

    def forward(self, x, n_points):
        h, attn_vis = self._attend(self.norm1(x), n_points)
        x = x[:, -n_points:] + h if self.last_layer else x + h
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x, attn_vis


class ImplicitOracle(nn.Module):
    """Reference Implicit (implicit.py:186-288), shipped config: 2 blocks,
    C=256, 8 heads, 8-hidden-layer MLP with skips {2,4,6}, posenc off,
    pos_perlayer off."""

    def __init__(self, num_patches=16, latent_dim=256, n_channels=256,
                 n_blocks=2, heads=8, n_hidden=8, skip_in=(2, 4, 6)):
        super().__init__()
        self.point_proj = nn.Module()
        self.point_proj.proj = nn.Linear(3, n_channels)
        self.latent_proj = nn.Linear(latent_dim, n_channels)
        self.register_buffer(
            "pos_embed",
            torch.from_numpy(
                sincos_pos_embed(n_channels, int(num_patches**0.5))
            )[None],
        )
        self.blocks_attn = nn.ModuleList(
            [
                ImplBlock(n_channels, heads, last_layer=(i == n_blocks - 1))
                for i in range(n_blocks)
            ]
        )
        self.norm = nn.LayerNorm(n_channels, eps=1e-6)
        self.impl_mlp = nn.Module()
        dims = [3 + n_channels] + [n_channels] * n_hidden + [1]
        self.skip_in = skip_in
        layers = []
        for l in range(len(dims) - 1):
            in_dim = dims[l] + dims[0] if l in skip_in else dims[l]
            layers.append(nn.Linear(in_dim, dims[l + 1]))
        self.impl_mlp.layers = nn.ModuleList(layers)
        self.n_dims0 = dims[0]
        self.n_layers = len(dims) - 1

    def forward(self, latent_depth, points_3D):
        latent = self.latent_proj(latent_depth)
        L = latent.shape[1]
        pts = self.point_proj.proj(points_3D)
        n_points = pts.shape[1]
        x = torch.cat([latent, pts], dim=1)
        attn_vis = []
        for l, blk in enumerate(self.blocks_attn):
            if l == 0:  # pos_perlayer=False
                x = torch.cat([x[:, :L] + self.pos_embed, x[:, L:]], dim=1)
            x, attn = blk(x, n_points)
            attn_vis.append(attn)
        x = self.norm(x)
        attn_vis = torch.stack(attn_vis, dim=-1).mean(dim=-1)

        softplus = nn.Softplus(beta=100)
        inputs = torch.cat([points_3D, x], dim=-1)
        h = inputs
        for l in range(self.n_layers):
            if l in self.skip_in:
                h = torch.cat([h, inputs], dim=-1) / math.sqrt(2.0)
            h = self.impl_mlp.layers[l](h)
            if l < self.n_layers - 1:
                h = softplus(h)
        return h.squeeze(-1), attn_vis


def randomize_with_buffers_(model, seed=0):
    """Random params + realistic BN buffers (positive running_var)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.8 + 0.6)
    return model
