"""Fused Pallas kernel for the implicit decoder's point stream.

The occupancy-grid decode is the inference hot loop: 2.1M query points at
vox_res=128, each running 2 blocks of cross-attention against 197 cached
latent K/V plus a 9-linear skip MLP. The whole decoder is ~1.5M parameters
(~3 MB bf16) — small enough to park in VMEM together with the latent caches,
so one Pallas kernel can stream point tiles through the entire network with
zero HBM traffic for weights or activations between layers.

Shapes are specialized to the shipped architecture (C=256, 8 heads, 2 blocks,
mlp_ratio 4, 8 hidden MLP layers, skips at {2,4,6}); the caller falls back to
the XLA path for other configs. Latent length is padded to a lane multiple
and masked inside the softmax.

Exactness: matches models/implicit.py decode() (same masked joint softmax,
LayerNorms in fp32, matmuls with fp32 accumulation) — asserted in tests.

Attention comes in three layouts (``attn_mode``):

  * ``"perhead"`` — a Python loop over heads with [T, hd] x [hd, L] score
    matmuls. hd=32 under-fills the 128-wide MXU contraction, which made the
    first version of this kernel ~1.6x slower than the XLA decode path.
  * ``"blockdiag"`` — the cached K/V are pre-arranged into block-diagonal
    matrices K_bd [C, H*L_pad] and V_bd [H*L_pad, C] so ALL heads' scores
    come from ONE [T, C] x [C, H*L_pad] matmul and all heads' outputs from
    ONE [T, H*L_pad] x [H*L_pad, C] matmul. The zero blocks waste 8x score
    FLOPs but both matmuls run at full MXU occupancy, and attention FLOPs
    are small next to the MLP stack. Per-head softmax statistics are cheap
    VPU slices.
  * ``"grouped"`` (shipped default, ``eval.fused_attn_mode``) — blockdiag
    in groups of g=128//hd heads, so the contraction stays one MXU tile
    deep while the zero-block waste drops from n_heads x to g x. Won the
    end-to-end recon A/B on chip (BASELINE.md round 4: 110.4 ms vs
    blockdiag's 115.6).

All three produce bit-identical outputs (asserted in tests).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x, m):
    return (x + m - 1) // m * m


def fused_supported(opt) -> bool:
    """True when ``opt.arch`` matches the shapes this kernel is specialized
    to (the shipped config: C=256, 8 heads, 2 attention blocks, mlp_ratio 4,
    8 hidden MLP layers + output = 9 linears, skips at {2,4,6}, no 3D
    positional encoding). Callers fall back to the XLA decode otherwise.
    Only the decode-side stack matters — the latent trunk (and hence the
    optional semantic stream) runs outside this kernel.
    """
    impl = opt.arch.impl
    return (
        opt.arch.latent_dim == 256
        and opt.arch.num_heads == 8
        and impl.n_channels == 256
        and impl.att_blocks == 2
        and impl.mlp_layers == 8
        and float(impl.mlp_ratio) == 4.0
        and tuple(impl.skip_in) == (2, 4, 6)
        and int(impl.posenc_3D or 0) == 0
    )


def pack_decoder_params(impl_params: Dict[str, Any], n_blocks: int = 2, n_mlp_linears: int = 9):
    """Stack the implicit decoder's params into kernel-friendly arrays."""
    p = impl_params

    def stack(fn):
        return jnp.stack([fn(p[f"block{i}"]) for i in range(n_blocks)])

    packed = {
        "point_w": p["point_proj"]["kernel"],  # [3, C]
        "point_b": p["point_proj"]["bias"],  # [C]
        "ln1": stack(lambda b: jnp.stack([b["norm1"]["scale"], b["norm1"]["bias"]])),
        "qkv_w": stack(lambda b: b["qkv"]["kernel"]),  # [B, C, 3C]
        "qkv_b": stack(lambda b: b["qkv"]["bias"]),  # [B, 3C]
        "proj_w": stack(lambda b: b["proj"]["kernel"]),
        "proj_b": stack(lambda b: b["proj"]["bias"]),
        "ln2": stack(lambda b: jnp.stack([b["norm2"]["scale"], b["norm2"]["bias"]])),
        "fc1_w": stack(lambda b: b["mlp"]["fc1"]["kernel"]),
        "fc1_b": stack(lambda b: b["mlp"]["fc1"]["bias"]),
        "fc2_w": stack(lambda b: b["mlp"]["fc2"]["kernel"]),
        "fc2_b": stack(lambda b: b["mlp"]["fc2"]["bias"]),
        "lnf": jnp.stack([p["norm"]["scale"], p["norm"]["bias"]]),
    }
    for l in range(n_mlp_linears):
        packed[f"mlp_w{l}"] = p["impl_mlp"][f"lin{l}"]["kernel"]
        packed[f"mlp_b{l}"] = p["impl_mlp"][f"lin{l}"]["bias"]
    return packed


def fused_decode_batched(points, caches, packed, **kw):
    """Batched :func:`fused_decode`: points [B, P, 3] against per-sample
    caches (each block's (k, v) is [B, H, L, hd]) -> logits [B, P].

    Implemented as ``jax.vmap`` over the single-sample kernel — Pallas lifts
    the mapped axis into an extra grid dimension, so per-sample tiles still
    stream through the decoder with weights/caches resident in VMEM. The
    batch axis is NOT SPMD-partitionable by GSPMD (a pallas_call is opaque
    to the partitioner); on multi-device eval meshes the engine wraps this
    call in ``jax.shard_map`` over the data axis so each device decodes its
    own batch shard (runtime/shape_engine.py:_recon_fn).
    """
    kvs = [(k, v) for (k, v) in caches]

    def one(pts, kvs_b):
        caches_b = [(k[None], v[None]) for (k, v) in kvs_b]
        return fused_decode(pts, caches_b, packed, **kw)

    return jax.vmap(one)(points, kvs)


def _layernorm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias)


def _erf(x):
    # Abramowitz & Stegun 7.1.26 rational approximation (|err| < 1.5e-7),
    # used because lax.erf has no Pallas/Mosaic TPU lowering. The error is
    # ~100x below the kernel's bf16 matmul noise floor, so the fused decode
    # still matches the exact-gelu XLA path within test tolerance.
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(x):
    # exact erf GELU (torch nn.GELU; matches models/layers.gelu_exact)
    x32 = x.astype(jnp.float32)
    return 0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))


def _softplus100(x):
    return jnp.where(x * 100.0 > 20.0, x, jax.nn.softplus(x * 100.0) / 100.0)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _decoder_kernel(
    # prefetched scalars: none. inputs follow pack order + pts; out last.
    pts_ref,
    kh_ref,
    vh_ref,
    point_w_ref,
    point_b_ref,
    ln1_ref,
    qkv_w_ref,
    qkv_b_ref,
    proj_w_ref,
    proj_b_ref,
    ln2_ref,
    fc1_w_ref,
    fc1_b_ref,
    fc2_w_ref,
    fc2_b_ref,
    lnf_ref,
    *rest,
    tile: int,
    n_blocks: int,
    n_heads: int,
    latent_len: int,
    skip_in: tuple,
    n_mlp_linears: int,
    attn_mode: str,
):
    from jax.experimental import pallas as pl

    mlp_refs = rest[:-1]
    out_ref = rest[-1]

    pts = pts_ref[...].astype(jnp.float32)  # [T, 3]
    C = point_w_ref.shape[1]
    hd = C // n_heads
    scale = hd**-0.5
    # perhead: kh_ref [B, H, L_pad, hd]; blockdiag: kh_ref [B, C, H*L_pad];
    # grouped: kh_ref [B, n_groups, g*hd, g*L_pad]
    if attn_mode == "perhead":
        L_pad = kh_ref.shape[2]
    elif attn_mode == "blockdiag":
        L_pad = kh_ref.shape[2] // n_heads
    else:
        L_pad = kh_ref.shape[3] // (n_heads // kh_ref.shape[1])

    compute = jnp.bfloat16

    def dense(x, w, b=None):
        y = _dot(x.astype(compute), w.astype(compute))
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y

    # point embedding: [T, 3] @ [3, C]
    p = dense(pts, point_w_ref[...], point_b_ref[...])  # fp32 [T, C]

    lat_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, L_pad), 1) < latent_len
    )  # [1, L_pad]

    def attn_perhead(q, k, v, blk):
        outs = []
        for h in range(n_heads):
            sl = slice(h * hd, (h + 1) * hd)
            qh = q[:, sl]  # [T, hd]
            kh = kh_ref[blk, h]  # [L_pad, hd]
            vh = vh_ref[blk, h]
            scores = (
                _dot(qh.astype(compute), jnp.swapaxes(kh, 0, 1).astype(compute))
                * scale
            )  # [T, L_pad] fp32
            scores = jnp.where(lat_mask, scores, -jnp.inf)
            s_self = jnp.sum(qh * k[:, sl], axis=-1, keepdims=True) * scale  # [T, 1]
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_self)
            e = jnp.exp(scores - m)
            e_self = jnp.exp(s_self - m)
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
            w_lat = e / denom
            out_h = _dot(w_lat.astype(compute), vh.astype(compute))  # [T, hd]
            out_h = out_h + (e_self / denom) * v[:, sl]
            outs.append(out_h)
        return jnp.concatenate(outs, axis=-1)  # [T, C]

    def attn_blockdiag(q, k, v, blk):
        # ONE full-occupancy score matmul for all heads: the zero off-blocks
        # of K_bd make column slice h equal to q_h @ k_h^T
        scores_all = (
            _dot(q.astype(compute), kh_ref[blk].astype(compute)) * scale
        )  # [T, H*L_pad] fp32
        qk = q * k  # [T, C]
        w_slices = []
        self_out = []
        for h in range(n_heads):
            sl = scores_all[:, h * L_pad : (h + 1) * L_pad]
            sl = jnp.where(lat_mask, sl, -jnp.inf)
            s_self = (
                jnp.sum(qk[:, h * hd : (h + 1) * hd], axis=-1, keepdims=True) * scale
            )  # [T, 1]
            m = jnp.maximum(jnp.max(sl, axis=-1, keepdims=True), s_self)
            e = jnp.exp(sl - m)
            e_self = jnp.exp(s_self - m)
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
            w_slices.append((e / denom).astype(compute))
            self_out.append((e_self / denom) * v[:, h * hd : (h + 1) * hd])
        w_all = jnp.concatenate(w_slices, axis=-1)  # [T, H*L_pad] bf16
        out = _dot(w_all, vh_ref[blk].astype(compute))  # [T, C] fp32
        return out + jnp.concatenate(self_out, axis=-1)

    def attn_grouped(q, k, v, blk):
        # blockdiag in groups of g heads: contraction g*hd stays MXU-deep
        # (128 for the shipped hd=32) while the zero-block waste drops from
        # n_heads x to g x — half the attention FLOPs of full blockdiag
        n_groups = kh_ref.shape[1]
        g = n_heads // n_groups
        qk = q * k  # [T, C]
        outs = []
        for G in range(n_groups):
            qG = q[:, G * g * hd : (G + 1) * g * hd]  # [T, g*hd]
            scores_all = (
                _dot(qG.astype(compute), kh_ref[blk, G].astype(compute)) * scale
            )  # [T, g*L_pad] fp32
            w_slices = []
            self_out = []
            for j in range(g):
                h = G * g + j
                sl = scores_all[:, j * L_pad : (j + 1) * L_pad]
                sl = jnp.where(lat_mask, sl, -jnp.inf)
                s_self = (
                    jnp.sum(qk[:, h * hd : (h + 1) * hd], axis=-1, keepdims=True)
                    * scale
                )
                m = jnp.maximum(jnp.max(sl, axis=-1, keepdims=True), s_self)
                e = jnp.exp(sl - m)
                e_self = jnp.exp(s_self - m)
                denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
                w_slices.append((e / denom).astype(compute))
                self_out.append((e_self / denom) * v[:, h * hd : (h + 1) * hd])
            w_all = jnp.concatenate(w_slices, axis=-1)  # [T, g*L_pad] bf16
            out = _dot(w_all, vh_ref[blk, G].astype(compute))  # [T, g*hd] fp32
            outs.append(out + jnp.concatenate(self_out, axis=-1))
        return jnp.concatenate(outs, axis=-1)  # [T, C]

    attn_fn = {
        "perhead": attn_perhead,
        "blockdiag": attn_blockdiag,
        "grouped": attn_grouped,
    }[attn_mode]

    for blk in range(n_blocks):
        n = _layernorm(p, ln1_ref[blk, 0], ln1_ref[blk, 1])
        qkv = dense(n, qkv_w_ref[blk], qkv_b_ref[blk])  # [T, 3C] fp32
        q = qkv[:, :C]
        k = qkv[:, C : 2 * C]
        v = qkv[:, 2 * C :]
        attn_out = attn_fn(q, k, v, blk)
        p = p + dense(attn_out, proj_w_ref[blk], proj_b_ref[blk])
        n2 = _layernorm(p, ln2_ref[blk, 0], ln2_ref[blk, 1])
        hmid = _gelu(dense(n2, fc1_w_ref[blk], fc1_b_ref[blk]))
        p = p + dense(hmid, fc2_w_ref[blk], fc2_b_ref[blk])

    x = _layernorm(p, lnf_ref[0], lnf_ref[1])  # [T, C] fp32

    # skip MLP: inputs = concat([pts, x]); concat matmuls split algebraically
    def mlp_linear(l, a_pts, a_x, extra=None):
        w = mlp_refs[2 * l][...]
        b = mlp_refs[2 * l + 1][...]
        # w rows: [3 (pts) | C (trunk) | C (skip state, only at skips)]
        y = dense(a_pts, w[:3]) + _dot(a_x.astype(compute), w[3 : 3 + C].astype(compute))
        if extra is not None:
            y = y + _dot(extra.astype(compute), w[3 + C :].astype(compute))
        return y + b.astype(jnp.float32)

    inputs_pts = pts
    inputs_x = x
    h = None
    for l in range(n_mlp_linears):
        if l == 0:
            h = _softplus100(mlp_linear(0, inputs_pts, inputs_x))
        else:
            if l in skip_in:
                inv = 1.0 / math.sqrt(2.0)
                y = mlp_linear(l, inputs_pts * inv, inputs_x * inv, extra=h * inv)
            else:
                w = mlp_refs[2 * l][...]
                b = mlp_refs[2 * l + 1][...]
                y = _dot(h.astype(compute), w.astype(compute)) + b.astype(jnp.float32)
            h = _softplus100(y) if l < n_mlp_linears - 1 else y
    # final layer output is [T, 1] padded to lanes; store column 0 as the
    # (8, tile/8)-shaped output block for this grid step
    out_ref[0] = h[:, 0].reshape(8, tile // 8)


def fused_decode(
    points,
    caches,
    packed,
    *,
    latent_len,
    n_blocks=2,
    n_heads=8,
    skip_in=(2, 4, 6),
    n_mlp_linears=9,
    tile=512,
    interpret=False,
    attn_mode="blockdiag",
    vmem_limit_bytes=None,
):
    """Occupancy logits for ``points`` [P, 3] against cached latents.

    Args:
      caches: list over blocks of (k, v), each [1, H, L, hd] (batch of 1).
      packed: output of :func:`pack_decoder_params`.
      attn_mode: "blockdiag" (full-MXU block-diagonal K/V matmuls) or
        "perhead" (per-head small matmuls; slower, kept for A/B timing).
    Returns:
      logits [P] float32.
    """
    from jax.experimental import pallas as pl

    P = points.shape[0]
    C = packed["point_w"].shape[1]
    hd = C // n_heads
    L = caches[0][0].shape[2]
    assert L == latent_len
    L_pad = _round_up(L, 128)

    kh = jnp.stack([c[0][0] for c in caches])  # [B, H, L, hd]
    vh = jnp.stack([c[1][0] for c in caches])
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, L_pad - L), (0, 0)))
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, L_pad - L), (0, 0)))
    if attn_mode == "blockdiag":
        # K_bd [B, C, H*L_pad]: block h rows h*hd:(h+1)*hd = k_h^T
        # V_bd [B, H*L_pad, C]: block h cols h*hd:(h+1)*hd = v_h
        HL = n_heads * L_pad
        kbd = jnp.zeros((n_blocks, C, HL), kh.dtype)
        vbd = jnp.zeros((n_blocks, HL, C), vh.dtype)
        for h in range(n_heads):
            rs, cs = slice(h * hd, (h + 1) * hd), slice(h * L_pad, (h + 1) * L_pad)
            kbd = kbd.at[:, rs, cs].set(jnp.swapaxes(kh[:, h], -1, -2))
            vbd = vbd.at[:, cs, rs].set(vh[:, h])
        kh, vh = kbd, vbd
    elif attn_mode == "grouped":
        # blockdiag in groups of g heads, g*hd = 128 (one MXU contraction):
        # K_g [B, n_groups, g*hd, g*L_pad] with local-head-j block rows
        # j*hd:(j+1)*hd, cols j*L_pad:(j+1)*L_pad = k_h^T (h = G*g + j);
        # V_g [B, n_groups, g*L_pad, g*hd] transposed likewise. Halves the
        # zero-block FLOP waste of full blockdiag at equal MXU depth.
        g = max(1, 128 // hd)
        while n_heads % g:
            g //= 2
        n_groups = n_heads // g
        kg = jnp.zeros((n_blocks, n_groups, g * hd, g * L_pad), kh.dtype)
        vg = jnp.zeros((n_blocks, n_groups, g * L_pad, g * hd), vh.dtype)
        for h in range(n_heads):
            G, j = divmod(h, g)
            rs, cs = slice(j * hd, (j + 1) * hd), slice(j * L_pad, (j + 1) * L_pad)
            kg = kg.at[:, G, rs, cs].set(jnp.swapaxes(kh[:, h], -1, -2))
            vg = vg.at[:, G, cs, rs].set(vh[:, h])
        kh, vh = kg, vg

    Pp = _round_up(P, tile)
    pts = jnp.pad(points.astype(jnp.float32), ((0, Pp - P), (0, 0)))

    # restructure skip-layer weights: rows [pts(3) | trunk(C) | state(C)];
    # matmul weights travel as bf16 (halves resident VMEM; matches the
    # in-kernel compute dtype), biases/norm params stay fp32
    mlp_inputs = []
    for l in range(n_mlp_linears):
        w = packed[f"mlp_w{l}"]
        b = packed[f"mlp_b{l}"]
        if l == 0:
            pass  # already [3 + C, C]
        elif l in skip_in:
            # reference concat order is [state, inputs] = [state, pts, trunk];
            # rearrange rows to [pts, trunk, state]
            w = jnp.concatenate([w[C : C + 3], w[C + 3 :], w[:C]], axis=0)
        if l == n_mlp_linears - 1:
            w = jnp.pad(w, ((0, 0), (0, 128 - w.shape[1])))
            b = jnp.pad(b, (0, 128 - b.shape[0]))
        mlp_inputs.extend([w.astype(jnp.bfloat16), b])

    bf = lambda x: x.astype(jnp.bfloat16)
    inputs = [
        pts,
        bf(kh),
        bf(vh),
        bf(packed["point_w"]),
        packed["point_b"][None],
        packed["ln1"],
        bf(packed["qkv_w"]),
        packed["qkv_b"],
        bf(packed["proj_w"]),
        packed["proj_b"],
        packed["ln2"],
        bf(packed["fc1_w"]),
        packed["fc1_b"],
        bf(packed["fc2_w"]),
        packed["fc2_b"],
        packed["lnf"],
    ] + mlp_inputs

    def spec_for(x, is_pts=False):
        if is_pts:
            return pl.BlockSpec((tile, 3), lambda i: (i, 0))
        return pl.BlockSpec(x.shape, lambda i: tuple(0 for _ in x.shape))

    in_specs = [spec_for(inputs[0], is_pts=True)] + [spec_for(x) for x in inputs[1:]]

    kernel = partial(
        _decoder_kernel,
        tile=tile,
        n_blocks=n_blocks,
        n_heads=n_heads,
        latent_len=L,
        skip_in=tuple(skip_in),
        n_mlp_linears=n_mlp_linears,
        attn_mode=attn_mode,
    )
    flops_per_pt = (
        n_blocks * (2 * C * 3 * C + 2 * C * L + 2 * C * C + 4 * C * 4 * C)
        + 2 * C * C * n_mlp_linears
    )
    compiler_params = None
    if vmem_limit_bytes is not None and not interpret:
        from jax.experimental.pallas import tpu as pltpu

        params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams"
        )
        compiler_params = params_cls(vmem_limit_bytes=vmem_limit_bytes)
    out = pl.pallas_call(
        kernel,
        grid=(Pp // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, tile // 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp // tile, 8, tile // 8), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * Pp,
            bytes_accessed=Pp * (3 + 1) * 4,
            transcendentals=Pp * C * n_mlp_linears,
        ),
    )(*inputs)
    return out.reshape(-1)[:P]
