"""TPU check: the fused-decoder hier path reproduces the XLA hier path.

Compares the fused Pallas decoder against the XLA cached-latent decoder on
the identical coarse lattice + full hier reconstruction:
  1. raw logit deltas on the 33^3 coarse lattice (bf16 numerical noise only
     — the kernel equivalence is asserted exactly in fp32 interpret mode by
     tests/test_implicit_kernel.py);
  2. binarized 129^3 level-grid agreement (the marching-cubes input). With
     the x25-sharpened random-init field many voxels sit exactly at the 0.5
     threshold, so a small mismatch fraction is expected there; a trained
     saturated field has measure-zero marginal voxels.
Run on the real chip: python scripts/check_fused_engine.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt
from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.ops import implicit_kernel

VOX = 128
CAP = 4096


def main():
    opt = _full_opt()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    batch = _batch(B=1, H=opt.H, n_pts=16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    infer = {k: batch[k] for k in ("rgb_input_map", "mask_input_map")}
    assert implicit_kernel.fused_supported(opt)

    def make_decoders(variables, out):
        caches = model.apply(
            variables, out["latent_depth"],
            method=lambda mdl, l: mdl.impl_network.encode(l),
        )
        packed = implicit_kernel.pack_decoder_params(
            variables["params"]["impl_network"]
        )

        def fused_fn(pts):
            occ = implicit_kernel.fused_decode(
                pts[0], caches, packed, latent_len=caches[0][0].shape[2]
            )
            return 25.0 * occ[None]

        def xla_fn(pts):
            occ = model.apply(
                variables, caches, pts,
                method=lambda mdl, c, p: mdl.impl_network.decode(c, p)[0],
            )
            return 25.0 * occ

        return fused_fn, xla_fn

    # 1. logit deltas on the coarse lattice
    @jax.jit
    def coarse_logits(variables, batch):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )
        fused_fn, xla_fn = make_decoders(variables, out)
        pts = eval3d.get_dense_3D_grid(32, (-1.5, 1.5)).reshape(1, -1, 3)
        return fused_fn(pts), xla_fn(pts)

    t0 = time.perf_counter()
    lf, lx = jax.device_get(coarse_logits(variables, infer))
    print(f"coarse lattice compile+run {time.perf_counter() - t0:.1f} s", flush=True)
    d = np.abs(lf - lx) / 25.0  # pre-sharpen logit scale
    print(f"coarse logit |diff| (pre-sharpen): max {d.max():.5f}, "
          f"mean {d.mean():.6f}, p99 {np.percentile(d, 99):.5f}")
    assert d.max() < 0.05, d.max()  # bf16 noise scale, far under saturation

    # 2. full hier reconstruction agreement
    def build(use_fused):
        @jax.jit
        def recon(variables, batch):
            out = model.apply(
                variables, batch, train=False, with_supervision=False, mutable=False
            )
            fused_fn, xla_fn = make_decoders(variables, out)
            decode_fn = fused_fn if use_fused else xla_fn
            level, n_active, _, _ = eval3d.occupancy_grid_hierarchical(
                decode_fn, VOX, (-1.5, 1.5), batch_size=1, capacity=CAP,
                return_stats=True, return_cells=True,
            )
            return level, n_active

        return recon

    results = {}
    for name, fused in (("xla", False), ("fused", True)):
        recon = build(fused)
        t0 = time.perf_counter()
        level, n_active = recon(variables, infer)
        level = np.asarray(level)
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f} s, "
              f"n_active={int(np.asarray(n_active)[0])}", flush=True)
        results[name] = (level, int(np.asarray(n_active)[0]))

    lx, nx = results["xla"]
    lf, nf = results["fused"]
    print(f"n_active: xla {nx}, fused {nf} "
          f"(marginal-band flips expected on the random-init field)")
    bx, bf_ = lx > 0.5, lf > 0.5
    n_diff = int(np.sum(bx != bf_))
    frac = n_diff / bx.size
    print(f"binarized grid mismatches: {n_diff} / {bx.size} ({frac:.2e})")
    # voxels flipping at the threshold under bf16 noise; the sharpened
    # random field is the worst case
    assert frac < 2e-4, frac
    print("FUSED ENGINE PATH OK")


if __name__ == "__main__":
    main()
