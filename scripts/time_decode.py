"""A/B timing: XLA implicit decode vs fused Pallas kernel on the real chip.

Times the full 129^3 occupancy-grid decode (2.15M queries) against cached
latents with (a) the XLA tile path used by metrics/eval3d.occupancy_grid and
(b) the fused Pallas kernel at several tile sizes / attention modes.

Run on TPU: python scripts/time_decode.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu.models.implicit import Implicit
from zeroshape_tpu.ops.implicit_kernel import fused_decode, pack_decoder_params

VOX = 128
S = VOX + 1


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    m = Implicit(dtype=dtype)
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(1, 197, 256)), jnp.float32)
    pts_init = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, pts_init)

    caches = jax.jit(lambda v, l: m.apply(v, l, method=lambda md, x: md.encode(x)))(
        vars_, latent
    )
    grid = eval3d.get_dense_3D_grid(VOX)

    @jax.jit
    def xla_decode(vars_, caches, grid):
        def decode_fn(pts):
            return m.apply(
                vars_,
                caches,
                pts,
                method=lambda md, c, p: md.decode(c, p)[0],
            )

        return eval3d.occupancy_grid(decode_fn, grid, batch_size=1, tile_points=S * S)

    t = timeit(xla_decode, vars_, caches, grid)
    print(f"xla tile={S * S}: {t * 1e3:.1f} ms")

    VLIM = 100 * 1024 * 1024
    for mode in ("blockdiag", "perhead"):
        for tile in (512, 1024, 2048, 4096):
            try:
                f = jax.jit(
                    lambda v, c, g, mode=mode, tile=tile: fused_decode(
                        g, c, pack_decoder_params(v["params"]),
                        latent_len=197, tile=tile, attn_mode=mode,
                        vmem_limit_bytes=VLIM,
                    )
                )
                t = timeit(f, vars_, caches, grid)
                print(f"pallas {mode} tile={tile}: {t * 1e3:.1f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"pallas {mode} tile={tile}: FAILED {type(e).__name__}: {str(e)[:200]}")
                break


if __name__ == "__main__":
    main()
