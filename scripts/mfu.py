"""FLOP accounting + MFU for the hot programs (train step, reconstruction).

Protocol: FLOPs come from XLA's post-optimization cost model
(``jitted.lower(...).compile().cost_analysis()['flops']``). The fused Pallas
decoder is a custom call XLA cannot cost, so reconstruction FLOPs are taken
from the *XLA-decode* variant of the same math (identical matmul/conv work)
while the wall time is measured on the shipped fused path — i.e. reported
recon MFU is a lower bound for the fused kernel. Peak: TPU v5e (v5 lite)
= 197 TFLOP/s bf16 per chip.

Wall times are measured in-process (median of reps after a warmup window,
host-transfer sync — BASELINE.md protocol). If cost_analysis is unavailable
on the attached backend, the program is lowered for CPU to read the same
HLO-level FLOP count (stated in the output).

Run on the chip: python scripts/mfu.py [train|recon|all]
Env: MFU_REPS (default 9), BENCH_CKPT/BENCH_DATA as in bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

V5E_PEAK_FLOPS = 197e12  # bf16 dense, per chip


def _cost_flops_compiled(compiled):
    try:
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            f = c.get("flops")
            if f and f > 0:
                return float(f), "device cost_analysis"
    except Exception as e:
        print(f"device cost_analysis unavailable ({e})", file=sys.stderr)
    return None, None


def _cost_flops(lowered):
    try:
        return _cost_flops_compiled(lowered.compile())
    except Exception as e:
        print(f"device cost_analysis unavailable ({e})", file=sys.stderr)
        return None, None


def _flops_fallback_cpu(fn, *args):
    """Lower the same function for CPU to read XLA's HLO FLOP count.

    Args are pulled to the host first: device-committed (e.g. sharded TPU)
    arrays would steer lowering back to the device backend under
    ``jax.default_device(cpu)`` — defeating the fallback exactly when the
    device cost_analysis already failed.
    """
    args = jax.device_get(args)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
    c = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(c["flops"]), "cpu-lowered cost_analysis"


def _time_calls(fn, args, reps, warmup=10):
    # chained warmup window first: the tunneled backend pages params through
    # the tunnel on the first post-compile dispatches (BASELINE.md)
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _mfu_step(name, step, state, sharded, key, reps, B):
    """AOT-compile a train step, read its FLOPs, time 10-step chained windows."""
    t0 = time.perf_counter()
    compiled = step.lower(state, sharded, key).compile()
    print(f"{name} compile: {time.perf_counter()-t0:.1f} s", file=sys.stderr)
    flops, src = _cost_flops_compiled(compiled)
    if flops is None:
        flops, src = _flops_fallback_cpu(
            lambda s, b, k: step(s, b, k), state, sharded, key
        )

    # timing: chain steps through the returned state (the production loop)
    state, metrics = compiled(state, sharded, key)
    np.asarray(metrics["loss_all"])
    for i in range(10):  # warmup window (tunnel param paging)
        state, metrics = compiled(state, sharded, jax.random.fold_in(key, i))
    np.asarray(metrics["loss_all"])
    times = []
    for w in range(reps):
        t0 = time.perf_counter()
        for i in range(10):
            state, metrics = compiled(
                state, sharded, jax.random.fold_in(key, 100 + w * 10 + i)
            )
        np.asarray(metrics["loss_all"])
        times.append((time.perf_counter() - t0) / 10)
    t = float(np.median(times))
    return {
        "name": name,
        "flops": flops,
        "flops_source": src,
        "seconds": t,
        "tflops_per_s": flops / t / 1e12,
        "mfu_pct_v5e_bf16": 100 * flops / t / V5E_PEAK_FLOPS,
        "img_per_s": B / t,
    }


def mfu_train(reps):
    from __graft_entry__ import _batch, _full_opt
    from zeroshape_tpu.models import graph_shape
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.parallel import train as ptrain
    from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch

    B = 28
    opt = _full_opt()
    model = ShapeGraph.from_opt(opt, dtype=jnp.bfloat16)
    mesh = make_mesh(1)
    batch = _batch(B=B, H=opt.H, n_pts=opt.training.n_sdf_points)
    state = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)
    sharded = shard_batch(batch, mesh)
    return _mfu_step(
        f"train_step_b{B}", step, state, sharded, jax.random.PRNGKey(2), reps, B
    )


def mfu_depth(reps):
    """Depth-pretrain step at the reference batch (options/depth.yaml:5,9:
    batch 44, loss weights depth 1 / intr 10)."""
    from __graft_entry__ import _batch, _full_opt
    from zeroshape_tpu.models import graph_depth
    from zeroshape_tpu.models.graph_depth import DepthGraph
    from zeroshape_tpu.parallel import train as ptrain
    from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch
    from zeroshape_tpu.runtime.depth_engine import model_batch

    B = int(os.environ.get("MFU_DEPTH_B", "44"))
    opt = _full_opt().unfrozen_copy()
    opt.loss_weight.update({"shape": None, "depth": 1, "intr": 10})
    model = DepthGraph.from_opt(opt, dtype=jnp.bfloat16)
    mesh = make_mesh(1)
    batch = model_batch(_batch(B=B, H=opt.H, n_pts=16))
    state = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = ptrain.make_train_step(model, opt, graph_depth.compute_loss, mesh)
    sharded = shard_batch(batch, mesh)
    return _mfu_step(
        f"depth_step_b{B}", step, state, sharded, jax.random.PRNGKey(2), reps, B
    )


def mfu_recon(reps):
    import bench

    # FLOPs from the XLA-decode variant (Pallas is opaque to the cost model)
    recon_xla, variables, batch = bench.build(use_fused=False)
    key = jax.random.PRNGKey(0)
    flops, src = _cost_flops(recon_xla.lower(variables, batch, key))
    if flops is None:
        flops, src = _flops_fallback_cpu(
            lambda v, b, k: recon_xla(v, b, k), variables, batch, key
        )

    # time from the shipped fused path
    recon_fused, variables, batch = bench.build()
    t = _time_calls(recon_fused, (variables, batch, key), reps, warmup=3)
    return {
        "name": "recon_vox128_hier_fused",
        "flops": flops,
        "flops_source": src + " (XLA-decode variant; fused time)",
        "seconds": t,
        "tflops_per_s": flops / t / 1e12,
        "mfu_pct_v5e_bf16": 100 * flops / t / V5E_PEAK_FLOPS,
        "img_per_s": 1 / t,
    }


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    reps = int(os.environ.get("MFU_REPS", "9"))
    rows = []
    if what in ("train", "all"):
        rows.append(mfu_train(reps))
    if what in ("depth", "all"):
        rows.append(mfu_depth(reps))
    if what in ("recon", "all"):
        rows.append(mfu_recon(reps))
    for r in rows:
        print(
            f"{r['name']}: {r['flops']/1e9:.1f} GFLOP ({r['flops_source']}), "
            f"{r['seconds']*1e3:.1f} ms -> {r['tflops_per_s']:.2f} TFLOP/s "
            f"= {r['mfu_pct_v5e_bf16']:.1f}% of v5e bf16 peak "
            f"({r['img_per_s']:.1f} img/s)",
            flush=True,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
