"""Sharded training step: optax param groups, grad accumulation, pjit.

Rebuilds the reference's training runtime (model/shape_engine.py:75-136,
248-297) the TPU way:

  * The AdamW param-group split — (finetune vs scratch) x (decay vs nodecay),
    finetune = DPT + intrinsics head — becomes ``optax.multi_transform`` over
    a path-derived label tree. ``fix_dpt`` freezes the finetune groups with
    ``optax.set_to_zero`` (replacing DDP's ``find_unused_parameters``).
  * Gradient accumulation uses ``optax.MultiSteps`` (reference accumulates
    ``loss.backward()`` across ``optim.accum`` iterations).
  * AMP/GradScaler is unnecessary: the forward runs in bf16 where requested
    and the loss/optimizer math stays fp32.
  * One jitted train_step with donated state; batch sharded over the mesh's
    data axis, params replicated; XLA emits the gradient all-reduce (the
    reference's implicit DDP all-reduce, shape_engine.py:259).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from typing import Any, Optional
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from zeroshape_tpu.losses import summarize_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _is_finetune(path) -> bool:
    """Reference rule (shape_engine.py:109): 'dpt_depth' or 'intr_' in name."""
    keys = [getattr(p, "key", str(p)) for p in path]
    return any(("dpt_depth" in k) or k.startswith("intr_") for k in keys)


def _is_nodecay(path, leaf) -> bool:
    """Reference rule (shape_engine.py:87): ndim <= 1 or name endswith bias."""
    keys = [getattr(p, "key", str(p)) for p in path]
    return leaf.ndim <= 1 or (keys and keys[-1].endswith("bias"))


def param_group_labels(params):
    """Label tree: finetune_nodecay / finetune_decay / scratch_nodecay / scratch_decay."""

    def label(path, leaf):
        ft = _is_finetune(path)
        nd = _is_nodecay(path, leaf)
        return ("finetune_" if ft else "scratch_") + ("nodecay" if nd else "decay")

    return jax.tree_util.tree_map_with_path(label, params)


def epoch_cosine_schedule(base_lr: float, max_epoch: int, steps_per_epoch: int):
    """Per-epoch cosine annealing (torch CosineAnnealingLR stepped per epoch,
    reference shape_engine.py:133-134, 239)."""

    def sched(step):
        ep = jnp.minimum(step // max(steps_per_epoch, 1), max_epoch)
        return 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * ep / max_epoch))

    return sched


def make_optimizer(
    params,
    lr: float,
    lr_ft: Optional[float] = None,
    weight_decay: float = 0.05,
    fix_dpt: bool = False,
    clip_norm: Optional[float] = None,
    accum: int = 1,
    sched: Optional[tuple] = None,
):
    """AdamW(betas 0.9/0.95) with the reference's four param groups.

    ``sched``: optional (max_epoch, steps_per_epoch) enabling per-epoch
    cosine annealing.
    """
    lr_ft = lr_ft if lr_ft is not None else lr

    def make_sched(base):
        if sched:
            # the schedule counts OPTIMIZER updates, and under MultiSteps
            # only every accum-th mini-batch commits one — scale the
            # per-epoch step count so the anneal tracks real epochs
            return epoch_cosine_schedule(base, sched[0], max(1, sched[1] // accum))
        return base

    def adamw(base_lr, wd):
        return optax.adamw(make_sched(base_lr), b1=0.9, b2=0.95, weight_decay=wd)

    transforms = {
        "scratch_decay": adamw(lr, weight_decay),
        "scratch_nodecay": adamw(lr, 0.0),
        "finetune_decay": optax.set_to_zero() if fix_dpt else adamw(lr_ft, weight_decay),
        "finetune_nodecay": optax.set_to_zero() if fix_dpt else adamw(lr_ft, 0.0),
    }
    labels = param_group_labels(params)
    tx = optax.multi_transform(transforms, labels)
    if clip_norm:
        pre = []
        if fix_dpt:
            # zero frozen-group grads BEFORE the global-norm clip: the DPT
            # backbone holds most parameters, so letting its (discarded)
            # gradients into ||g|| would over-clip the only trainable groups.
            # The reference's frozen params carry no grads at all, so its
            # clip norm sees only live gradients (shape_engine.py:269-270).
            frozen = jax.tree.map(lambda l: l.startswith("finetune_"), labels)
            pre.append(optax.masked(optax.set_to_zero(), frozen))
        tx = optax.chain(*pre, optax.clip_by_global_norm(clip_norm), tx)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(model, opt, batch, rng, steps_per_epoch=None):
    """Initialize params/batch_stats and the optimizer."""
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, batch, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    optim = opt.optim
    use_sched = optim.get("sched") and steps_per_epoch
    tx = make_optimizer(
        params,
        lr=optim.lr,
        lr_ft=optim.get("lr_ft"),
        weight_decay=optim.weight_decay,
        fix_dpt=optim.get("fix_dpt", False),
        clip_norm=optim.get("clip_norm"),
        accum=optim.get("accum", 1) or 1,
        sched=(opt.max_epoch, steps_per_epoch) if use_sched else None,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(
    model, opt, loss_fn, mesh, axis_name: str = "data", metrics_fn=None
):
    """Build the jitted, mesh-sharded train step.

    loss_fn(opt, batch, out, training) -> dict of unweighted loss terms.
    metrics_fn(opt, batch, out) -> dict of extra scalar diagnostics computed
    from the forward outputs (e.g. graph_shape.attn_geo_stats); merged into
    the returned metrics.
    Returns train_step(state, batch, rng) -> (state, metrics dict).
    """
    loss_weights = dict(opt.loss_weight)
    batch_sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def step_fn(state, batch, rng):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = model.apply(
                variables,
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss_dict = loss_fn(opt, batch, out, training=True)
            total = summarize_loss(loss_dict, loss_weights)
            extra = metrics_fn(opt, batch, out) if metrics_fn else {}
            return total, (loss_dict, extra, mutated.get("batch_stats", state.batch_stats))

        (total, (loss_dict, extra, new_bs)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = {"loss_all": total}
        metrics.update({f"loss_{k}": jnp.mean(v) for k, v in loss_dict.items()})
        metrics.update({k: jax.lax.stop_gradient(v) for k, v in extra.items()})
        return new_state, metrics

    return jax.jit(
        step_fn,
        in_shardings=(None, batch_sh, rep),
        donate_argnums=(0,),
    )
