"""Round-2 TPU timings: pipelined train loop + fused-kernel hier A/B.

1. Train step at batch 28 (reference global batch): per-step host sync (the
   old engine loop) vs pipelined dispatch with one sync per K steps (the new
   buffered-loss loop) — quantifies the dispatch-floor overhead the sync
   removal buys back.
2. Coarse-to-fine (hier) occupancy decode with the XLA cached-latent decoder
   vs the fused Pallas decoder as the fine-pass decode_fn — the data for
   keeping or demoting ops/implicit_kernel.py (VERDICT round 1, weak #5).

Run on the real chip: python scripts/time_r2.py [train|hier|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def time_train():
    from __graft_entry__ import _batch, _full_opt
    from zeroshape_tpu.models import graph_shape
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.parallel import train as ptrain
    from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch

    opt = _full_opt().unfrozen_copy()
    opt.training.n_sdf_points = 4096
    opt = opt.freeze()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    mesh = make_mesh(len(jax.devices()))
    B = 28
    batch = _batch(B=B, H=opt.H, n_pts=opt.training.n_sdf_points)
    state = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(2)
    state, metrics = step(state, sharded, key)
    sync(metrics["loss_all"])

    K = 10
    # old loop: host-sync the loss every step
    t0 = time.perf_counter()
    for i in range(K):
        state, metrics = step(state, sharded, jax.random.fold_in(key, i))
        float(metrics["loss_all"])
    t_sync = (time.perf_counter() - t0) / K

    # new loop: buffer device scalars, one stacked transfer at the boundary
    buf = []
    t0 = time.perf_counter()
    for i in range(K):
        state, metrics = step(state, sharded, jax.random.fold_in(key, 100 + i))
        buf.append(metrics["loss_all"])
    np.asarray(jax.device_get(jnp.stack(buf)))
    t_pipe = (time.perf_counter() - t0) / K

    print(
        f"train step B={B}: per-step sync {t_sync * 1e3:.1f} ms/step "
        f"({B / t_sync:.1f} img/s) | pipelined {t_pipe * 1e3:.1f} ms/step "
        f"({B / t_pipe:.1f} img/s)",
        flush=True,
    )


def time_hier():
    from zeroshape_tpu.metrics import eval3d
    from zeroshape_tpu.models.implicit import Implicit
    from zeroshape_tpu.ops.implicit_kernel import fused_decode, pack_decoder_params

    VOX = 128
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
    packed = pack_decoder_params(vars_["params"])

    def xla_decode_fn(pts):
        # sharpen so the active-cell count is realistic (bench.py workload)
        return 25.0 * m.apply(
            vars_, caches, pts, method=lambda md, c, p: md.decode(c, p)[0]
        )

    def fused_decode_fn(pts):
        return 25.0 * fused_decode(pts[0], caches, packed, latent_len=197)[None]

    results = {}
    for name, fn in (("xla", xla_decode_fn), ("fused", fused_decode_fn)):
        hier = jax.jit(
            lambda _x, fn=fn: eval3d.occupancy_grid_hierarchical(
                fn, VOX, batch_size=1
            )
        )
        t_compile0 = time.perf_counter()
        sync(hier(0))
        print(f"hier[{name}] compile {time.perf_counter() - t_compile0:.1f} s", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(hier(0))
            ts.append(time.perf_counter() - t0)
        results[name] = float(np.median(ts))
        print(f"hier decode 129^3 [{name}]: {results[name] * 1e3:.1f} ms", flush=True)
    print(
        f"fused/xla ratio: {results['fused'] / results['xla']:.2f}", flush=True
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("train", "all"):
        time_train()
    if which in ("hier", "all"):
        time_hier()
