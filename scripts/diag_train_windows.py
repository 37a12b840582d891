"""Diagnose train-step steady-state vs warmup on the tunneled chip.

Runs W windows of K chained steps at batch 28, host-syncing the stacked loss
buffer at each window boundary (exactly the production pipelined loop), and
reports each window separately. If later windows are fast, early numbers are
backend warmup/paging; if all windows are slow, the step genuinely costs that
much right now. Run: python scripts/diag_train_windows.py [K] [W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt
from zeroshape_tpu.models import graph_shape
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.parallel import train as ptrain
from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    opt = _full_opt()
    model = ShapeGraph.from_opt(opt, dtype=jnp.bfloat16)
    mesh = make_mesh(1)
    B = 28
    batch = _batch(B=B, H=opt.H, n_pts=opt.training.n_sdf_points)
    state = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(2)

    t0 = time.perf_counter()
    state, metrics = step(state, sharded, key)
    np.asarray(metrics["loss_all"])
    print(f"compile+first {time.perf_counter()-t0:.1f} s", flush=True)

    n = 0
    for w in range(W):
        buf = []
        t0 = time.perf_counter()
        for i in range(K):
            n += 1
            state, metrics = step(state, sharded, jax.random.fold_in(key, n))
            buf.append(metrics["loss_all"])
        t_enq = time.perf_counter() - t0
        np.asarray(jax.device_get(jnp.stack(buf)))
        t_tot = time.perf_counter() - t0
        print(
            f"window {w}: enqueue {t_enq/K*1e3:8.1f} ms/step, "
            f"synced {t_tot/K*1e3:8.1f} ms/step ({B*K/t_tot:.1f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
