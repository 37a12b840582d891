"""Train-step throughput on the real chip: batch-size sweep.

Times the full jitted shape train step (forward + backward + AdamW) at
several per-chip batch sizes, printing ms/step and img/s. Larger batches
amortize the fixed DPT fusion/conv overhead; find the throughput knee.
Run: python scripts/time_train.py [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    from zeroshape_tpu.models import graph_shape
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.parallel import train as ptrain
    from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch

    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 28, 32]
    opt = _full_opt()
    opt = opt.unfrozen_copy()
    opt.training.n_sdf_points = 4096
    opt = opt.freeze()

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    mesh = make_mesh(len(jax.devices()))

    for B in batches:
        batch = _batch(B=B, H=opt.H, n_pts=opt.training.n_sdf_points)
        state = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
        step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)
        sharded = shard_batch(batch, mesh)
        key = jax.random.PRNGKey(2)
        state, metrics = step(state, sharded, key)  # compile
        sync(metrics["loss_all"])
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            state, metrics = step(state, sharded, jax.random.fold_in(key, i))
            sync(metrics["loss_all"])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"batch {B}: {t * 1e3:.1f} ms/step -> {B / t:.1f} img/s", flush=True)
        del state, step


if __name__ == "__main__":
    main()
