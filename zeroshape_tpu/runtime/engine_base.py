"""Shared Runner scaffolding for the shape/depth engines.

Lifecycle mirrors the reference Runner (model/shape_engine.py:20-163):
load_dataset / build_networks / setup_optimizer / restore_checkpoint /
setup_visualizer / train / evaluate — re-expressed for single-controller JAX:
no process groups, no DDP wrappers, one host feeding a device mesh.
"""

from __future__ import annotations

import importlib
import os
import shutil
import time

import numpy as np

from zeroshape_tpu.parallel.mesh import make_mesh_for_batch
from zeroshape_tpu.runtime.logging import log_print

from zeroshape_tpu.runtime import checkpoint as ckpt_util

DATASETS = {
    "synthetic": "zeroshape_tpu.data.synthetic",
    "pix3d": "zeroshape_tpu.data.pix3d",
    "ocrtoc": "zeroshape_tpu.data.ocrtoc",
    "omniobj3d": "zeroshape_tpu.data.omniobj3d",
}


def load_dataset_module(name: str):
    return importlib.import_module(DATASETS[name])


class RunnerBase:
    def __init__(self, opt):
        self.opt = opt
        out = opt.output_path
        if os.path.isdir(out) and not opt.get("resume"):
            for filename in os.listdir(out):
                full = os.path.join(out, filename)
                if "tfevents" in filename or filename.endswith(".html"):
                    os.remove(full)
                if filename.startswith("vis") and os.path.isdir(full):
                    shutil.rmtree(full)
        os.makedirs(out, exist_ok=True)
        self.mesh = make_mesh_for_batch(opt.batch_size)
        self.tb = None
        self.best_val = np.inf
        self.best_ep = 1
        self.epoch_start = 0
        self.iter_start = 0
        self.it = 0
        self.ep = 0

    # -- data ---------------------------------------------------------------
    def load_dataset(self, eval_split="test", load_train=True):
        opt = self.opt
        if load_train:
            mod = load_dataset_module(opt.data.dataset_train)
            log_print("loading training data...")
            self.train_data = mod.Dataset(opt, split="train")
            self.train_loader = self.train_data.setup_loader(
                opt, shuffle=True, drop_last=True
            )
            self.num_batches = len(self.train_loader)
        mod_t = load_dataset_module(opt.data.dataset_test)
        log_print("loading test data...")
        self.test_data = mod_t.Dataset(opt, split=eval_split)
        self.test_loader = self.test_data.setup_loader(
            opt, shuffle=False, drop_last=False, batch_size=opt.eval.batch_size
        )
        self.viz_data = self._collect_viz_data()

    def _collect_viz_data(self):
        opt = self.opt
        n_vis = opt.eval.get("n_vis", 0)
        if not n_vis:
            return []
        n = len(self.test_data)
        if n == 0:
            return []
        step = max(n // n_vis, 1)
        from zeroshape_tpu.data.base import default_collate

        return [default_collate([self.test_data[i]]) for i in range(0, n, step)][:n_vis]

    # -- async train-loop metrics ---------------------------------------------
    # The jitted train step dispatches asynchronously; calling float(loss)
    # every iteration blocks on the result and serializes the loop (each
    # dispatch carries a ~30 ms floor on the axon backend — BASELINE.md).
    # Instead the per-step device scalars are buffered and host-synced in one
    # transfer at print/scalar/ckpt boundaries, which also runs the finite-
    # loss gate (reference asserts every step, shape_engine.py:327-328; here
    # the gate runs before anything is logged or checkpointed).

    def _note_loss(self, metrics):
        self._loss_buf.append(metrics["loss_all"])

    def _flush_loss_buf(self):
        if not getattr(self, "_loss_buf", None):
            return
        import jax
        import jax.numpy as jnp

        n = len(self._loss_buf)
        vals = np.asarray(jax.device_get(jnp.stack(self._loss_buf)))
        self._loss_buf.clear()
        assert np.isfinite(vals).all(), (
            f"loss is not finite within {n} iters of iter {self.it}"
        )
        # wall time per step across the sync window: the honest steady-state
        # step time through the real loop (per-step host syncing would
        # serialize dispatch on tunneled backends — see the buffer note above)
        now = time.perf_counter()
        t0 = getattr(self, "_flush_t0", None)
        if t0 is not None and n:
            self.train_metric_logger.update(s_it=(now - t0) / n)
        self._flush_t0 = now
        for v in vals:
            self.train_metric_logger.update(lr=self.opt.optim.lr, loss=float(v))

    def _reset_step_clock(self):
        """Exclude non-step work (ckpt writes, scalar logging, viz dumps,
        eval) from the next s_it window."""
        self._flush_t0 = time.perf_counter()

    def _epoch_batches(self):
        """This epoch's host batches with the resume-replay skip applied.

        Resume replays the interrupted epoch's loader order and skips the
        already-trained prefix (reference iter_start handling,
        model/shape_engine.py:248-258); applying the skip here keeps
        skipped batches out of the device-prefetch pipeline.
        """
        for batch in self.train_loader:
            if self.iter_skip > 0:
                self.iter_skip -= 1
                continue
            yield batch

    # -- checkpoints ----------------------------------------------------------
    def stage_pretrained(self):
        """Load pretrained depth/intr weights into the fresh state (reference
        Graph.__init__ -> load_pretrained_depth, graph_shape.py:69-87). Runs
        before restore_checkpoint, so --resume/--load override it, exactly as
        the reference's constructor-then-restore ordering does."""
        self.state = ckpt_util.stage_pretrained(
            self.state, self.opt, graph=self.graph_name, log=log_print
        )

    def _device_put_state(self):
        """Move the state onto the mesh (replicated), leaves committed.

        Restored payloads and staged pretrained weights are host-numpy trees
        (checkpoint.apply_payload / merge_params); left that way, EVERY
        jitted call re-uploads all params — on a tunneled TPU backend that
        is seconds per call, ~100x the actual compute. Training self-heals
        after one step (the returned state is device-resident), but
        evaluate/demo pay it on every batch. One explicit transfer here
        fixes all of it.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        self.state = self.state.replace(
            params=jax.device_put(self.state.params, rep),
            batch_stats=jax.device_put(self.state.batch_stats, rep),
            opt_state=jax.device_put(self.state.opt_state, rep),
        )

    def restore_checkpoint(self, best=False, evaluate=False):
        opt = self.opt
        if opt.get("resume"):
            name = "best.ckpt" if best else "latest.ckpt"
            path = os.path.join(opt.output_path, name)
            log_print(f"resuming from {path}...")
            payload = ckpt_util.restore_checkpoint(path, self.state)
            self.state = ckpt_util.apply_payload(
                self.state, payload, restore_optim=not evaluate
            )
            self.epoch_start = int(payload["epoch"]) + 1
            self.iter_start = int(payload["iter"])
            self.best_val = float(payload["best_val"])
            self.best_ep = int(payload["best_ep"])
        elif opt.get("load"):
            log_print(f"loading weights from {opt.load}...")
            self.load_weights(opt.load)
        else:
            log_print("initializing weights from scratch...")
        # covers --resume / --load / staged-pretrained / scratch alike
        self._device_put_state()

    def load_weights(self, path):
        """Accepts a torch .ckpt file or an orbax checkpoint directory."""
        if os.path.isdir(path):
            payload = ckpt_util.restore_checkpoint(path, self.state)
            self.state = ckpt_util.apply_payload(self.state, payload, restore_optim=False)
        else:
            params, stats, report, meta = ckpt_util.load_torch_checkpoint(
                path, graph=self.graph_name
            )
            if report["missing"]:
                log_print(f"warning: {len(report['missing'])} keys missing from ckpt")
            self.state = self.state.replace(
                params=ckpt_util.merge_params(self.state.params, params),
                batch_stats=ckpt_util.merge_params(self.state.batch_stats, stats)
                if stats
                else self.state.batch_stats,
            )

    def save_checkpoint(self, ep, it, latest=False, best=False):
        import jax

        if jax.process_index() != 0:
            # single writer: in a multi-process run every process sees the
            # same output_path on a shared filesystem, and concurrent
            # rename-swap sequences (checkpoint._replace_dir) race — the
            # reference writes from rank 0 only (shape_engine.py:283-295)
            return None
        path = ckpt_util.save_checkpoint(
            self.opt.output_path, self.state, ep, it, self.best_val, self.best_ep,
            latest=latest, best=best,
        )
        if not latest:
            log_print(f"checkpoint saved: ep {ep} (iteration {it})")
        if best:
            log_print("Saving the current model as the best...")
        return path

    # -- visualizer -----------------------------------------------------------
    def setup_visualizer(self, test=False):
        import jax

        if jax.process_index() != 0:
            # single writer: the reference logs scalars/dumps from rank 0
            # only (shape_engine.py:283-295)
            self.tb = None
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            logdir = (
                self.opt.output_path
                if not test
                else os.path.join(self.opt.output_path, "embedding")
            )
            os.makedirs(logdir, exist_ok=True)
            self.tb = SummaryWriter(log_dir=logdir, flush_secs=10)
        except Exception as e:  # pragma: no cover
            log_print(f"tensorboard unavailable ({e}); scalar logging to stdout only")
            self.tb = None

    def log_scalar(self, tag, value, step):
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), step)
