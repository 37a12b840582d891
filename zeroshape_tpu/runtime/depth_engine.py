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
from zeroshape_tpu.parallel.mesh import prefetch_to_device, shard_batch
from zeroshape_tpu.runtime.engine_base import RunnerBase
from zeroshape_tpu.runtime.logging import MetricLogger, SmoothedValue, log_print
from zeroshape_tpu.runtime.shape_engine import _pad_batch

MODEL_KEYS = ("rgb_input_map", "mask_input_map", "depth_input_map", "intr")


def model_batch(batch):
    return {k: v for k, v in batch.items() if k in MODEL_KEYS}


class Runner(RunnerBase):
    graph_name = "depth"

    def build_networks(self, dtype=None):
        from zeroshape_tpu.models import resolve_compute_dtype

        dtype = dtype or resolve_compute_dtype(self.opt)
        log_print(f"building networks (compute dtype: {jnp.dtype(dtype).name})...")
        self.model = DepthGraph.from_opt(self.opt, dtype=dtype)
        self._eval_prog = None
        self._viz_fwd = None

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
        self.stage_pretrained()

    def variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    def _eval_program(self, thresholds):
        """Forward + aligned depth metrics as ONE sharded program over the
        eval mesh: per-sample metric rows come back replicated so every
        process of a multi-host run holds the full values (the reference
        all_gathers them, depth_engine.py:329-332); the depth map stays
        batch-sharded for per-process dumping."""
        if self._eval_prog is not None:
            return self._eval_prog
        from jax.sharding import NamedSharding, PartitionSpec as P

        from zeroshape_tpu.parallel.mesh import make_mesh_for_batch

        opt = self.opt
        mesh = make_mesh_for_batch(opt.eval.batch_size, warn=False)
        bsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        model = self.model
        depth_cap = opt.eval.get("depth_cap")
        keys = metric_keys(thresholds)

        def run(variables, batch):
            out = model.apply(variables, batch, train=False)
            mask = batch.get("mask_eroded", batch["mask_input_map"])
            metrics, _ = compute_depth_metrics(
                jnp.transpose(out["depth_pred"], (0, 3, 1, 2)),
                jnp.transpose(batch["depth_input_map"], (0, 3, 1, 2)),
                jnp.transpose(mask, (0, 3, 1, 2)),
                thresholds=thresholds,
                depth_cap=depth_cap,
            )
            return metrics, out["depth_pred"]

        jitted = jax.jit(
            run,
            in_shardings=(rep, bsh),
            out_shardings=({k: rep for k in keys}, bsh),
        )
        self._eval_prog = (jitted, mesh)
        return self._eval_prog

    # -- training -------------------------------------------------------------
    def train(self):
        opt = self.opt
        log_print("TRAINING START")
        self.train_metric_logger = MetricLogger(delimiter="  ")
        self.train_metric_logger.add_meter(
            "lr", SmoothedValue(window_size=1, fmt="{value:.6f}")
        )
        self._loss_buf = []
        self.iter_skip = self.iter_start % max(len(self.train_loader), 1)
        self.it = self.iter_start
        if self.iter_start == 0 and not opt.get("debug"):
            self.evaluate(ep=0, training=True)
        for self.ep in range(self.epoch_start, opt.max_epoch):
            self.train_epoch()
        self._flush_loss_buf()
        self.save_checkpoint(ep=self.ep, it=self.it)
        log_print("TRAINING DONE")
        log_print("Best l1_err: %.4f @ epoch %d" % (self.best_val, self.best_ep))

    def train_epoch(self):
        opt = self.opt
        self.train_loader.set_epoch(self.ep)
        log_print(f"training epoch {self.ep + 1}")
        self._reset_step_clock()  # don't charge epoch setup/eval to s_it
        for batch, sharded in prefetch_to_device(
            self._epoch_batches(), self.mesh, select=model_batch
        ):
            self.train_iteration(batch, sharded)
        self._flush_loss_buf()
        if (self.ep + 1) % opt.freq.eval == 0:
            current_val = self.evaluate(ep=self.ep + 1, training=True)
            if current_val < self.best_val:
                self.best_val = current_val
                self.best_ep = self.ep + 1
                self.save_checkpoint(ep=self.ep, it=self.it, best=True, latest=True)

    def train_iteration(self, batch, sharded=None):
        opt = self.opt
        if sharded is None:
            sharded = shard_batch(model_batch(batch), self.mesh)
        rng = jax.random.fold_in(jax.random.PRNGKey(opt.get("seed", 0) or 0), self.it)
        self.state, metrics = self.train_step(self.state, sharded, rng)
        self._note_loss(metrics)
        it = self.it
        if (
            it % opt.freq.print == 0
            or it % opt.freq.scalar == 0
            or it % opt.freq.ckpt_latest == 0
        ):
            self._flush_loss_buf()
        if it % opt.freq.ckpt_latest == 0 and not opt.get("debug"):
            self.save_checkpoint(ep=self.ep, it=it, latest=True)
        if it % opt.freq.scalar == 0 and not opt.get("debug"):
            for k, v in jax.device_get(metrics).items():
                self.log_scalar(f"train/{k}", float(v), it)
        if it % opt.freq.print == 0:
            log_print(
                f"Train Iter {it}/{self.num_batches * opt.max_epoch}: "
                f"{self.train_metric_logger}"
            )
        if not opt.get("debug"):
            if opt.freq.get("vis") and it % opt.freq.vis == 0:
                self.visualize_train_batch(batch, it)
            if opt.freq.get("save_vis") and it % (
                opt.freq.save_vis * (it // 10000 * 10 + 1)
            ) == 0:
                self.vis_train_iter()
        if (
            it % opt.freq.print == 0
            or it % opt.freq.scalar == 0
            or it % opt.freq.ckpt_latest == 0
        ):
            self._reset_step_clock()
        self.it += 1

    def _viz_forward(self, batch):
        if self._viz_fwd is None:
            model = self.model
            self._viz_fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
        return self._viz_fwd(self.variables(), model_batch(batch))

    def visualize_train_batch(self, batch, step):
        """TensorBoard image grids at freq.vis (the reference depth engine's
        visualize() is an empty pass, depth_engine.py:405-407; here the grids
        are real)."""
        if self.tb is None:
            return
        out = self._viz_forward(batch)
        ni = tuple((self.opt.get("tb") or {}).get("num_images") or (4, 8))
        vis.tb_image(
            self.tb, step, "train", "image_input_map",
            np.asarray(batch["rgb_input_map"]), num_images=ni,
        )
        vis.tb_image(
            self.tb, step, "train", "mask_input_map",
            np.asarray(batch["mask_input_map"]), num_images=ni,
        )
        vis.tb_image(
            self.tb, step, "train", "depth_est_map", np.asarray(out["depth_pred"]),
            num_images=ni,
        )
        vis.tb_image(
            self.tb, step, "train", "depth_input_map",
            np.asarray(batch["depth_input_map"]), num_images=ni,
        )

    def vis_train_iter(self):
        """Viz-sample dumps into vis_log/iter_{it} (reference
        depth_engine.py:238-252; rank 0 only)."""
        if jax.process_index() != 0:
            return
        opt = self.opt
        folder = os.path.join("vis_log", f"iter_{self.it}")
        for sample in getattr(self, "viz_data", []) or []:
            out = self._viz_forward(sample)
            idx = np.asarray(sample["idx"])[:1]
            vis.dump_images(
                opt.output_path, idx, "image_input",
                np.asarray(sample["rgb_input_map"])[:1], folder=folder,
            )
            vis.dump_images(
                opt.output_path, idx, "mask_input",
                np.asarray(sample["mask_input_map"])[:1], folder=folder,
            )
            vis.dump_depths(
                opt.output_path, idx, "depth_est",
                np.asarray(out["depth_pred"])[:1],
                np.asarray(sample["mask_input_map"])[:1],
                rescale=True, folder=folder,
            )
            vis.dump_depths(
                opt.output_path, idx, "depth_input",
                np.asarray(sample["depth_input_map"])[:1],
                np.asarray(sample["mask_input_map"])[:1],
                rescale=True, folder=folder,
            )
            if "seen_points_pred" in out and "seen_points_gt" in out:
                vis.dump_pointclouds_compare(
                    opt.output_path, idx, "seen_surface",
                    np.asarray(out["seen_points_pred"])[:1],
                    np.asarray(out["seen_points_gt"])[:1],
                    folder=folder,
                )

    # -- evaluation -------------------------------------------------------------
    def evaluate(self, ep, training=False):
        """Depth-metric evaluation (reference depth_engine.py:300-379),
        multi-process-correct: global batches are assembled on the eval
        mesh, per-sample metrics come back replicated (the reference's
        all_gather), and padded tail rows are excluded by global count."""
        opt = self.opt
        thresholds = tuple(opt.eval.get("d_thresholds", (1.02, 1.05, 1.1, 1.2)))
        run, mesh = self._eval_program(thresholds)
        keys = metric_keys(thresholds)
        sums = {k: 0.0 for k in keys}
        count = 0
        eval_bs = opt.eval.batch_size
        n_proc = jax.process_count()
        is_main = jax.process_index() == 0
        local_bs = eval_bs // max(n_proc, 1)
        N = len(self.test_data)
        from zeroshape_tpu.parallel.mesh import replicate_to_host

        for it, batch in enumerate(self.test_loader):
            # valid rows of this GLOBAL batch (see shape_engine.evaluate)
            B0 = min(eval_bs, N - it * eval_bs)
            batch_p = _pad_batch(batch, local_bs)
            eval_keys = MODEL_KEYS + (
                ("mask_eroded",) if "mask_eroded" in batch_p else ()
            )
            dev = shard_batch(
                {k: batch_p[k] for k in eval_keys if k in batch_p}, mesh
            )
            metrics, depth_pred = run(self.variables(), dev)
            metrics = replicate_to_host(metrics, mesh)
            for k in keys:
                sums[k] += float(metrics[k][:B0].sum())
            count += B0
            if it % opt.freq.print_eval == 0:
                log_print(f"Eval Iter {it}/{len(self.test_loader)} @ EP {ep}")
            if not training and it == 0:
                self._dump_eval_batch(batch_p, depth_pred, B0)
        assert count == N
        means = {k: v / max(count, 1) for k, v in sums.items()}
        for k in keys:
            log_print(f"eval {k}: {means[k]:.4f}")
            if training:
                self.log_scalar(f"eval/{k}", means[k], ep)
        if not training and is_main:
            with open(os.path.join(opt.output_path, "best_val.txt"), "w") as f:
                for k in keys:
                    f.write(f"{k}: {means[k]:.6f}\n")
        return float(means["l1_err"])

    def _dump_eval_batch(self, batch_p, depth_pred, B0):
        """First-batch depth visualizations; each process dumps the rows it
        owns (multi-process keeps depth_pred sharded)."""
        opt = self.opt
        folder = f"dump_{opt.data.dataset_test}"
        if jax.process_count() == 1:
            depth_l, n_valid = np.asarray(depth_pred), B0
        else:
            from zeroshape_tpu.parallel.mesh import local_valid_rows

            _, depth_l, n_valid = local_valid_rows(depth_pred, B0)
        if n_valid <= 0:
            return
        idx = np.asarray(batch_p["idx"])[:n_valid]
        vis.dump_images(
            opt.output_path, idx, "image_input",
            np.asarray(batch_p["rgb_input_map"])[:n_valid], folder=folder,
        )
        vis.dump_depths(
            opt.output_path, idx, "depth_est",
            depth_l[:n_valid],
            np.asarray(batch_p["mask_input_map"])[:n_valid],
            rescale=True, folder=folder,
        )
