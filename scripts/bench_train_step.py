"""Train-step throughput vs per-chip batch size on the real chip.

The reference ships global batch 28 (options/shape.yaml:5, split across
GPUs); one v5e chip may sustain a larger per-chip batch. Times the full
sharded train step (pipelined: sync once at the end of `reps` steps, as the
production loop does at scalar cadence) for each batch size and reports
img/s. Run: python scripts/bench_train_step.py [reps] [batch sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

from __graft_entry__ import _batch, _full_opt
from zeroshape_tpu.models import graph_shape
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.parallel import train as ptrain
from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch

import jax.numpy as jnp


def main():
    args = sys.argv[1:]
    reps = int(args[0]) if args else 10
    batches = [int(a) for a in args[1:]] or [28, 42, 56, 84]
    opt = _full_opt()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    mesh = make_mesh(1)
    step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)

    for B in batches:
        batch = _batch(B=B, H=opt.H, n_pts=opt.training.n_sdf_points)
        sharded = shard_batch(batch, mesh)
        try:
            state = ptrain.create_train_state(
                model, opt, batch, jax.random.PRNGKey(0)
            )
            t0 = time.perf_counter()
            state, metrics = step(state, sharded, jax.random.PRNGKey(1))
            np.asarray(metrics["loss_all"])
            compile_s = time.perf_counter() - t0
            # warmup window: the first ~10 post-compile steps on this backend
            # run 100x slow (per-dispatch param paging through the tunnel);
            # steady state only starts after it (scripts/diag_train_windows.py)
            for i in range(10):
                state, metrics = step(
                    state, sharded, jax.random.fold_in(jax.random.PRNGKey(3), i)
                )
            np.asarray(metrics["loss_all"])
            t0 = time.perf_counter()
            for i in range(reps):
                state, metrics = step(
                    state, sharded, jax.random.fold_in(jax.random.PRNGKey(2), i)
                )
            np.asarray(metrics["loss_all"])  # one sync for the whole window
            dt = (time.perf_counter() - t0) / reps
            print(
                f"B={B:3d}: {dt*1e3:7.1f} ms/step  {B/dt:7.1f} img/s "
                f"(compile+first {compile_s:.1f} s)",
                flush=True,
            )
        except Exception as e:  # OOM at large B is an expected outcome
            print(f"B={B:3d}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
        del batch, sharded


if __name__ == "__main__":
    main()
