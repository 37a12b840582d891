"""Depth + intrinsics pretraining engine (reference model/depth_engine.py).

Same Runner skeleton as the shape engine; evaluation computes the aligned
depth metrics (delta thresholds / rmse / l1 / abs_rel) with best-checkpoint
selection on l1_err, and dumps aligned depth visualizations.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from zeroshape_tpu import vis
from zeroshape_tpu.metrics.depth_metrics import compute_depth_metrics, metric_keys
from zeroshape_tpu.models import graph_depth
from zeroshape_tpu.models.graph_depth import DepthGraph
from zeroshape_tpu.parallel import train as ptrain
from zeroshape_tpu.parallel.mesh import shard_batch
from zeroshape_tpu.runtime.engine_base import RunnerBase
from zeroshape_tpu.runtime.logging import MetricLogger, SmoothedValue, log_print
from zeroshape_tpu.runtime.shape_engine import _pad_batch

MODEL_KEYS = ("rgb_input_map", "mask_input_map", "depth_input_map", "intr")


def model_batch(batch):
    return {k: v for k, v in batch.items() if k in MODEL_KEYS}


class Runner(RunnerBase):
    graph_name = "depth"

    def build_networks(self, dtype=jnp.float32):
        log_print("building networks...")
        self.model = DepthGraph.from_opt(self.opt, dtype=dtype)
        self._eval_fn = None

    def setup_optimizer(self, init_batch):
        log_print("setting up optimizers...")
        opt = self.opt
        self.state = ptrain.create_train_state(
            self.model, opt, model_batch(init_batch),
            jax.random.PRNGKey(opt.get("seed", 0) or 0),
            steps_per_epoch=getattr(self, "num_batches", None),
        )
        self.train_step = ptrain.make_train_step(
            self.model, opt, graph_depth.compute_loss, self.mesh
        )

    def variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    def _forward(self):
        if self._eval_fn is None:
            model = self.model

            @jax.jit
            def fwd(variables, batch):
                return model.apply(variables, batch, train=False)

            self._eval_fn = fwd
        return self._eval_fn

    # -- training -------------------------------------------------------------
    def train(self):
        opt = self.opt
        log_print("TRAINING START")
        self.train_metric_logger = MetricLogger(delimiter="  ")
        self.train_metric_logger.add_meter(
            "lr", SmoothedValue(window_size=1, fmt="{value:.6f}")
        )
        self.iter_skip = self.iter_start % max(len(self.train_loader), 1)
        self.it = self.iter_start
        if self.iter_start == 0 and not opt.get("debug"):
            self.evaluate(ep=0, training=True)
        for self.ep in range(self.epoch_start, opt.max_epoch):
            self.train_epoch()
        self.save_checkpoint(ep=self.ep, it=self.it)
        log_print("TRAINING DONE")
        log_print("Best l1_err: %.4f @ epoch %d" % (self.best_val, self.best_ep))

    def train_epoch(self):
        opt = self.opt
        self.train_loader.set_epoch(self.ep)
        log_print(f"training epoch {self.ep + 1}")
        for batch in self.train_loader:
            if self.iter_skip > 0:
                self.iter_skip -= 1
                continue
            self.train_iteration(batch)
        if (self.ep + 1) % opt.freq.eval == 0:
            current_val = self.evaluate(ep=self.ep + 1, training=True)
            if current_val < self.best_val:
                self.best_val = current_val
                self.best_ep = self.ep + 1
                self.save_checkpoint(ep=self.ep, it=self.it, best=True, latest=True)

    def train_iteration(self, batch):
        opt = self.opt
        sharded = shard_batch(model_batch(batch), self.mesh)
        rng = jax.random.fold_in(jax.random.PRNGKey(opt.get("seed", 0) or 0), self.it)
        self.state, metrics = self.train_step(self.state, sharded, rng)
        loss_all = float(metrics["loss_all"])
        assert np.isfinite(loss_all), f"loss is not finite at iter {self.it}"
        self.train_metric_logger.update(lr=opt.optim.lr, loss=loss_all)
        if self.it % opt.freq.ckpt_latest == 0 and not opt.get("debug"):
            self.save_checkpoint(ep=self.ep, it=self.it, latest=True)
        if self.it % opt.freq.scalar == 0 and not opt.get("debug"):
            for k, v in metrics.items():
                self.log_scalar(f"train/{k}", float(v), self.it)
        if self.it % opt.freq.print == 0:
            log_print(
                f"Train Iter {self.it}/{self.num_batches * opt.max_epoch}: "
                f"{self.train_metric_logger}"
            )
        self.it += 1

    # -- evaluation -------------------------------------------------------------
    def evaluate(self, ep, training=False):
        opt = self.opt
        fwd = self._forward()
        thresholds = tuple(opt.eval.get("d_thresholds", (1.02, 1.05, 1.1, 1.2)))
        keys = metric_keys(thresholds)
        sums = {k: 0.0 for k in keys}
        count = 0
        eval_bs = opt.eval.batch_size
        for it, batch in enumerate(self.test_loader):
            B0 = batch["rgb_input_map"].shape[0]
            batch_p = _pad_batch(batch, eval_bs)
            out = fwd(self.variables(), model_batch(batch_p))
            mask = batch_p.get("mask_eroded", batch_p["mask_input_map"])
            metrics, aligned = compute_depth_metrics(
                jnp.transpose(out["depth_pred"], (0, 3, 1, 2)),
                jnp.transpose(jnp.asarray(batch_p["depth_input_map"]), (0, 3, 1, 2)),
                jnp.transpose(jnp.asarray(mask), (0, 3, 1, 2)),
                thresholds=thresholds,
                depth_cap=opt.eval.get("depth_cap"),
            )
            for k in keys:
                sums[k] += float(np.asarray(metrics[k])[:B0].sum())
            count += B0
            if it % opt.freq.print_eval == 0:
                log_print(f"Eval Iter {it}/{len(self.test_loader)} @ EP {ep}")
            if not training and it == 0:
                idx = np.asarray(batch["idx"])[:B0]
                folder = f"dump_{opt.data.dataset_test}"
                vis.dump_images(
                    opt.output_path, idx, "image_input",
                    np.asarray(batch["rgb_input_map"])[:B0], folder=folder,
                )
                vis.dump_depths(
                    opt.output_path, idx, "depth_est",
                    np.asarray(out["depth_pred"])[:B0],
                    np.asarray(batch["mask_input_map"])[:B0],
                    rescale=True, folder=folder,
                )
        means = {k: v / max(count, 1) for k, v in sums.items()}
        for k in keys:
            log_print(f"eval {k}: {means[k]:.4f}")
            if training:
                self.log_scalar(f"eval/{k}", means[k], ep)
        if not training:
            with open(os.path.join(opt.output_path, "best_val.txt"), "w") as f:
                for k in keys:
                    f.write(f"{k}: {means[k]:.6f}\n")
        return float(means["l1_err"])
