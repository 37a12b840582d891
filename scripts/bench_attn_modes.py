"""Same-process A/B of the fused decoder's attention layouts on the chip.

Times fused_decode at shipped shapes (C=256, 8 heads, L=197) over a large
point batch for each attn_mode and tile size. Run:
python scripts/bench_attn_modes.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _full_opt
from zeroshape_tpu.models.implicit import Implicit
from zeroshape_tpu.ops.implicit_kernel import fused_decode, pack_decoder_params


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    opt = _full_opt()
    impl = opt.arch.impl
    m = Implicit(
        num_patches=196, latent_dim=opt.arch.latent_dim,
        n_channels=impl.n_channels, n_blocks_attn=impl.att_blocks,
        n_layers_mlp=impl.mlp_layers, num_heads=opt.arch.num_heads,
        skip_in=tuple(impl.skip_in), dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    L, P = 197, 524288  # fine-pass scale: 4096 cells x 125 pts (padded)
    latent = jnp.asarray(rng.normal(size=(1, L, 256)), jnp.float32)
    points = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, points[None, :8])
    caches = m.apply(vars_, latent, method=lambda mdl, l: mdl.encode(l))
    packed = pack_decoder_params(vars_["params"])

    results = {}
    for mode in ("blockdiag", "grouped"):
        for tile in (512, 1024, 2048):
            name = f"{mode}/tile{tile}"
            # tiles past 512 exceed the 16M default scoped-vmem budget;
            # v5e has 128M VMEM, so grant what the layout actually needs
            fn = jax.jit(
                lambda c, p, mode=mode, tile=tile: fused_decode(
                    points, c, p, latent_len=L, attn_mode=mode, tile=tile,
                    vmem_limit_bytes=100 * 1024 * 1024,
                )
            )
            t0 = time.perf_counter()
            try:
                out = np.asarray(fn(caches, packed))
            except Exception as e:
                print(f"{name:22s} FAILED ({type(e).__name__}: {str(e)[:140]})", flush=True)
                continue
            print(f"{name:22s} compile+run {time.perf_counter()-t0:6.1f} s", flush=True)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn(caches, packed))
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            results[name] = (med, out)
            print(f"{name:22s} {med*1e3:8.1f} ms  (min {min(ts)*1e3:.1f})", flush=True)

    if not results:
        return
    base = next(iter(results.values()))[1]
    for name, (med, out) in results.items():
        d = np.abs(out - base).max()
        print(f"{name:22s} {med*1e3:8.1f} ms   max|diff vs base| {d:.5f}")


if __name__ == "__main__":
    main()
