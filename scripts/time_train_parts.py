"""Train-step breakdown at batch 28 on the real chip.

Times separately-jitted stages: forward+loss, value_and_grad, the full step,
and the full step with bf16 resize matmuls (monkeypatched A/B).
Run: python scripts/time_train_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt

B = 28


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=5):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from zeroshape_tpu.losses import summarize_loss
    from zeroshape_tpu.models import graph_shape
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.parallel import train as ptrain
    from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch

    opt = _full_opt().unfrozen_copy()
    opt.training.n_sdf_points = 4096
    opt = opt.freeze()
    dtype = jnp.bfloat16
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    mesh = make_mesh(len(jax.devices()))
    batch = _batch(B=B, H=opt.H, n_pts=opt.training.n_sdf_points)
    state = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    sharded = shard_batch(batch, mesh)
    weights = dict(opt.loss_weight)
    rng = jax.random.PRNGKey(2)

    bf16_only = "bf16only" in sys.argv[1:]

    def loss_of(params, bs, batch, rng):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, batch, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        ld = graph_shape.compute_loss(opt, batch, out, training=True)
        return summarize_loss(ld, weights)

    if not bf16_only:
        fwd = jax.jit(loss_of)
        t = timeit(fwd, state.params, state.batch_stats, sharded, rng)
        print(f"forward+loss: {t * 1e3:.1f} ms", flush=True)

        grad = jax.jit(jax.grad(loss_of))
        t = timeit(grad, state.params, state.batch_stats, sharded, rng)
        print(f"value_and_grad: {t * 1e3:.1f} ms", flush=True)

        step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)
        st = state
        st, m = step(st, sharded, rng)
        sync(m["loss_all"])
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            st, m = step(st, sharded, jax.random.fold_in(rng, i))
            sync(m["loss_all"])
            ts.append(time.perf_counter() - t0)
        print(f"full step: {float(np.median(ts)) * 1e3:.1f} ms", flush=True)
        del st, step

    # bf16 resize matmuls A/B
    from zeroshape_tpu.ops import image as image_ops

    orig = image_ops.resize_bilinear

    def resize_bf16(x, out_hw, align_corners=False):
        out_h, out_w = out_hw
        _, in_h, in_w, _ = x.shape
        if (in_h, in_w) == (out_h, out_w):
            return x
        Wh = jnp.asarray(image_ops._linear_resize_matrix(in_h, out_h, align_corners))
        Ww = jnp.asarray(image_ops._linear_resize_matrix(in_w, out_w, align_corners))
        cd = x.dtype
        y = jnp.einsum("oh,bhwc->bowc", Wh.astype(cd), x,
                       preferred_element_type=jnp.float32).astype(cd)
        y = jnp.einsum("ow,bhwc->bhoc", Ww.astype(cd), y,
                       preferred_element_type=jnp.float32).astype(cd)
        return y

    image_ops.resize_bilinear = resize_bf16
    try:
        import zeroshape_tpu.models.dpt as dpt_mod
        dpt_mod.resize_bilinear = resize_bf16
        dpt_mod.upsample2x = lambda x, align_corners=True: resize_bf16(
            x, (2 * x.shape[1], 2 * x.shape[2]), align_corners=align_corners
        )
        step2 = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)
        # the earlier donated step consumed `state`'s buffers; rebuild
        st = ptrain.create_train_state(model, opt, batch, jax.random.PRNGKey(0))
        st, m = step2(st, sharded, rng)
        sync(m["loss_all"])
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            st, m = step2(st, sharded, jax.random.fold_in(rng, i))
            sync(m["loss_all"])
            ts.append(time.perf_counter() - t0)
        print(f"full step (bf16 resize): {float(np.median(ts)) * 1e3:.1f} ms", flush=True)
    finally:
        image_ops.resize_bilinear = orig


if __name__ == "__main__":
    main()
