"""Shape-reconstruction training/evaluation engine.

Runtime equivalent of the reference ``model/shape_engine.py``: the train loop
(grad accumulation, periodic checkpoints/scalars/visualization, best-ckpt
selection on validation Chamfer) and the evaluation harness (dense occupancy
decode -> surface sampling -> [brute-force] Chamfer + F-score, per-sample
result files, per-category breakdown, HTML gallery).

TPU-shape of the loop: one jitted train step over the data mesh (no
barriers — SPMD is lockstep), one jitted reconstruction program that keeps
grid decode, marching-cubes sampling, and Chamfer on device, and a padded
final batch instead of the reference's auxiliary remainder loader.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from zeroshape_tpu import vis
from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu.models import graph_shape
from zeroshape_tpu.ops import implicit_kernel
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.ops.marching_cubes import (
    marching_cubes_mesh,
    sample_surface_points,
    sample_surface_points_cells,
)
from zeroshape_tpu.parallel import train as ptrain
from zeroshape_tpu.parallel.mesh import pad_batch as _pad_batch
from zeroshape_tpu.parallel.mesh import prefetch_to_device, shard_batch
from zeroshape_tpu.runtime.engine_base import RunnerBase
from zeroshape_tpu.runtime.logging import MetricLogger, SmoothedValue, log_print

MODEL_KEYS = (
    "rgb_input_map",
    "mask_input_map",
    "depth_input_map",
    "intr",
    "pose_gt",
    "gt_sample_points",
    "gt_sample_sdf",
)


def model_batch(batch):
    return {k: v for k, v in batch.items() if k in MODEL_KEYS}


class Runner(RunnerBase):
    graph_name = "shape"

    # -- construction ---------------------------------------------------------
    def build_networks(self, dtype=None):
        from zeroshape_tpu.models import resolve_compute_dtype

        dtype = dtype or resolve_compute_dtype(self.opt)
        log_print(f"building networks (compute dtype: {jnp.dtype(dtype).name})...")
        self.model = ShapeGraph.from_opt(self.opt, dtype=dtype)
        self._recon_cache = {}
        self._recon_attn_cache = {}
        self._score_cache = {}
        self._bf_cache = {}
        self._viz_fwd = None

    def _eval_mesh(self, batch_size):
        """Data mesh for evaluation at this batch size (reference evaluates
        data-parallel across all ranks, shape_engine.py:413-429; here the
        eval batch is sharded over as many devices as divide it — raise
        eval.batch_size to a device-count multiple for full utilization)."""
        from zeroshape_tpu.parallel.mesh import make_mesh_for_batch

        return make_mesh_for_batch(batch_size, warn=False)

    def setup_optimizer(self, init_batch):
        log_print("setting up optimizers...")
        opt = self.opt
        init = dict(model_batch(init_batch))
        if "gt_sample_points" not in init:
            # test-set samples carry no SDF supervision; init must still trace
            # the supervision branch or impl_network params are never created
            B = init["rgb_input_map"].shape[0]
            init.setdefault("depth_input_map", np.zeros((B, opt.H, opt.W, 1), np.float32))
            init.setdefault("intr", np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
            init.setdefault("pose_gt", np.zeros((B, 3, 4), np.float32))
            init["gt_sample_points"] = np.zeros((B, 8, 3), np.float32)
            init["gt_sample_sdf"] = np.zeros((B, 8), np.float32)
        self.state = ptrain.create_train_state(
            self.model, opt, init,
            jax.random.PRNGKey(opt.get("seed", 0) or 0),
            steps_per_epoch=getattr(self, "num_batches", None),
        )
        # two compiled step variants: the hot-loop step computes no attention
        # statistics; the scalar-cadence step adds attn_geo_stats (reference
        # logs scalars only at cadence, shape_engine.py:526-544 — computing
        # the reprojection diagnostics every iteration was pure waste)
        self.train_step = ptrain.make_train_step(
            self.model, opt, graph_shape.compute_loss, self.mesh
        )
        self.train_step_metrics = ptrain.make_train_step(
            self.model, opt, graph_shape.compute_loss, self.mesh,
            metrics_fn=graph_shape.attn_geo_stats,
        )
        self.stage_pretrained()

    def variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    @classmethod
    def for_inference(cls, opt, model):
        """Engine-less Runner exposing the jitted reconstruction paths.

        For callers that skip the training lifecycle (demo.py, benchmark
        scripts — the reference demo builds its Graph directly the same way,
        demo.py:167-168). The caller owns ``variables``; note that
        ``ShapeGraph.init`` only creates the implicit decoder's params when
        the init batch carries supervision keys (gt_sample_points /
        gt_sample_sdf) — see demo.py's dummy-supervision init.
        """
        runner = object.__new__(cls)
        runner.opt = opt
        runner.model = model
        runner._recon_cache = {}
        runner._recon_attn_cache = {}
        runner._score_cache = {}
        runner._bf_cache = {}
        runner._viz_fwd = None
        return runner

    @staticmethod
    def _mesh_key(mesh):
        """Meshes with different device sets compile different programs
        (shardings, shard_map wrapping, the n_dev fused gate), so every
        jit cache is keyed on the device list, not just the batch size."""
        return tuple(d.id for d in mesh.devices.flat)

    # -- jitted reconstruction --------------------------------------------------
    def _recon_fn(self, batch_size, mesh=None, training=True):
        """image batch -> (outputs, level grid, world-frame surface samples).

        The batch is sharded over the eval mesh's data axis (params
        replicated), so the grid decode and surface sampling for each sample
        run on their own device.

        ``training=True`` (in-training validation / viz) may use the
        coarse-to-fine decode (``eval.hier_decode``); final metric runs
        (``training=False``) use the exact dense decode unless
        ``eval.hier_final`` opts in — the hier margin heuristic is exact on
        every tested field, but a saturated trained decoder could in
        principle hide sub-cell features from the coarse pass, so reported
        numbers default to the exhaustive path.
        """
        mesh = mesh or self._eval_mesh(batch_size)
        key = (batch_size, bool(training), self._mesh_key(mesh))
        if key in self._recon_cache:
            return self._recon_cache[key]
        opt = self.opt
        vox = opt.eval.vox_res
        lo, hi = opt.eval.range
        S = vox + 1
        num_points = opt.eval.num_points
        model = self.model
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())

        hier_allowed = (
            opt.eval.get("hier_decode", True)
            if training
            else bool(opt.eval.get("hier_final", False))
        )
        use_hier = (
            hier_allowed
            and vox % 4 == 0
            and eval3d.hier_decode_saves_work(vox, opt.eval.get("hier_capacity"))
        )
        # fused Pallas decoder for the coarse-to-fine passes: streams point
        # tiles through the whole decoder with weights/latent caches resident
        # in VMEM (ops/implicit_kernel.py). Beats the XLA decode on the hier
        # path (BASELINE.md A/B); dense decode stays XLA, where it is faster.
        fused_mode = opt.eval.get("fused_decoder", True)
        # a pallas_call is opaque to the GSPMD partitioner, so on multi-device
        # eval meshes the kernel is wrapped in jax.shard_map over the data
        # axis: each device runs the fused decoder on its own batch shard
        # (reference evaluates data-parallel across ranks,
        # model/shape_engine.py:413-429)
        n_dev = len(mesh.devices.flat)
        use_fused = (
            use_hier
            and batch_size % n_dev == 0
            and bool(fused_mode)
            and implicit_kernel.fused_supported(opt)
            and (
                fused_mode == "interpret"
                or jax.devices()[0].platform in ("tpu", "axon")
            )
        )

        def recon(variables, batch, key):
            out = model.apply(variables, batch, train=False, with_supervision=False)

            if use_fused:
                caches = model.apply(
                    variables, out["latent_depth"], out["latent_semantic"],
                    method=lambda mdl, l, s: mdl.impl_network.encode(l, s),
                )
                packed = implicit_kernel.pack_decoder_params(
                    variables["params"]["impl_network"]
                )
                latent_len = caches[0][0].shape[2]

                interpret = fused_mode == "interpret"
                # attention layout + point-tile size (chip A/B table in
                # BASELINE.md; scripts/bench_attn_modes.py). Non-default
                # layouts need more than the 16 MiB default scoped-VMEM
                # budget — grant what the layout uses (v5e has 128 MiB).
                attn_mode = opt.eval.get("fused_attn_mode", "grouped")
                tile = int(opt.eval.get("fused_tile", 512) or 512)
                vmem = (
                    100 * 1024 * 1024
                    if (attn_mode != "blockdiag" or tile > 512)
                    else None
                )

                kw = dict(
                    latent_len=latent_len, interpret=interpret,
                    attn_mode=attn_mode, tile=tile, vmem_limit_bytes=vmem,
                )

                def decode_fn(pts):
                    if n_dev > 1:
                        # per-device shards run the kernel locally; no
                        # collectives are needed (points are independent)
                        from jax.sharding import PartitionSpec as PS

                        def local(pts_l, kvs_l, packed_l):
                            return implicit_kernel.fused_decode_batched(
                                pts_l, kvs_l, packed_l, **kw
                            )

                        # check_vma=False: the body is collective-free and a
                        # pallas_call's out_shape carries no vma annotation
                        return jax.shard_map(
                            local, mesh=mesh,
                            in_specs=(PS("data"), PS("data"), PS()),
                            out_specs=PS("data"),
                            check_vma=False,
                        )(pts, [tuple(c) for c in caches], packed)
                    if batch_size == 1:
                        occ = implicit_kernel.fused_decode(
                            pts[0], caches, packed, **kw
                        )
                        return occ[None]
                    return implicit_kernel.fused_decode_batched(
                        pts, caches, packed, **kw
                    )

            else:

                def decode_fn(pts):
                    def run(mdl, latent, sem, p):
                        caches = mdl.impl_network.encode(latent, sem)
                        occ, _ = mdl.impl_network.decode(caches, p)
                        return occ

                    return model.apply(
                        variables, out["latent_depth"], out["latent_semantic"], pts,
                        method=run,
                    )

            keys = jax.random.split(key, batch_size)
            if use_hier:
                # coarse-to-fine decode: identical surface, ~4x less decoder
                # work (exactness asserted in tests/test_hierarchical_decode.py);
                # surface sampling then only runs the area pass over the
                # active cells the decode already identified
                level, n_active, cell_ids, cell_valid = (
                    eval3d.occupancy_grid_hierarchical(
                        decode_fn, vox, (lo, hi), batch_size=batch_size,
                        capacity=opt.eval.get("hier_capacity"),
                        return_stats=True, return_cells=True,
                    )
                )
                out = dict(out, hier_n_active=n_active)
                pts = jax.vmap(
                    lambda lv, ids, vld, k: sample_surface_points_cells(
                        lv, ids, vld, k, num_points
                    )
                )(level, cell_ids, cell_valid, keys)
            else:
                grid_pts = eval3d.get_dense_3D_grid(vox, (lo, hi))
                occ = eval3d.occupancy_grid(
                    decode_fn, grid_pts, batch_size=batch_size, tile_points=S * S
                )
                level = occ.reshape(batch_size, S, S, S)
                pts = jax.vmap(
                    lambda lv, k: sample_surface_points(lv, k, num_points)
                )(level, keys)
            world = pts / S * (hi - lo) + lo

            # pin batch-leading outputs to the data axis: the multi-process
            # dump path (addressable_rows) requires contiguous leading-axis
            # shards, and GSPMD propagation is free to replicate small leaves
            # (e.g. hier_n_active [B]) if left unconstrained
            def pin(t):
                if getattr(t, "ndim", 0) >= 1 and t.shape[0] == batch_size:
                    return jax.lax.with_sharding_constraint(t, bsh)
                return t

            return jax.tree.map(pin, (out, level, world))

        jitted = jax.jit(recon, in_shardings=(rep, bsh, rep))
        self._recon_cache[key] = jitted
        return jitted

    def _score_fn(self, batch_size, mesh=None):
        mesh = mesh or self._eval_mesh(batch_size)
        key = (batch_size, self._mesh_key(mesh))
        if key in self._score_cache:
            return self._score_cache[key]
        opt = self.opt
        thresholds = tuple(opt.eval.f_thresholds)
        use_icp = bool(opt.eval.get("icp"))
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())

        def score(pred_world, gt_view):
            pred_n = eval3d.normalize_pc(pred_world)
            gt_n = eval3d.normalize_pc(gt_view)
            if use_icp:
                pred_n = eval3d.icp(pred_n, gt_n)
            acc_d, comp_d = eval3d.chamfer_eval(pred_n, gt_n)
            f = eval3d.compute_fscore(acc_d, comp_d, thresholds)
            return acc_d.mean(axis=1), comp_d.mean(axis=1), f, pred_n, gt_n

        # per-sample metrics replicated: every process of a multi-host run
        # holds the full rows (reference all_gathers them,
        # shape_engine.py:413-429); the normalized clouds stay sharded
        jitted = jax.jit(
            score,
            in_shardings=(bsh, bsh),
            out_shardings=(rep, rep, rep, bsh, bsh),
        )
        self._score_cache[key] = jitted
        return jitted

    def _gt_view_fn(self, batch_size, mesh, flip):
        """Jitted GT-cloud -> view-frame transform over the eval mesh. Eager
        jnp on the host batch would be wrong under multi-process sharding
        (each process holds only its slice), so the transform runs as a
        sharded program on the assembled global batch."""
        key = ("gt_view", batch_size, self._mesh_key(mesh), bool(flip))
        if key in self._score_cache:
            return self._score_cache[key]
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P("data"))
        jitted = jax.jit(
            lambda pts, pose: eval3d.transform_gt_to_view(pts, pose, flip_xy=flip),
            in_shardings=(bsh, bsh),
            out_shardings=bsh,
        )
        self._score_cache[key] = jitted
        return jitted

    def _recon_attn_fn(self, batch_size=1):
        """Dense reconstruction that also returns z-averaged attention maps
        (reference computes these for the visualization subset only:
        eval_metrics(vis_only=True) -> compute_level_grid(vis_attn=True),
        utils/eval_3D.py:47-81). Runs on the default device (viz is
        batch-1, process-local); the cache is keyed on that device like its
        mesh-keyed siblings so a device change cannot serve a stale program."""
        cache_key = (batch_size, jax.devices()[0].id)
        if cache_key in self._recon_attn_cache:
            return self._recon_attn_cache[cache_key]
        opt = self.opt
        vox = opt.eval.vox_res
        lo, hi = opt.eval.range
        S = vox + 1
        num_points = opt.eval.num_points
        model = self.model

        @jax.jit
        def recon(variables, batch, key):
            out = model.apply(variables, batch, train=False)

            def decode_fn(pts):
                def run(mdl, latent, sem, p):
                    caches = mdl.impl_network.encode(latent, sem)
                    return mdl.impl_network.decode(caches, p)

                return model.apply(
                    variables, out["latent_depth"], out["latent_semantic"], pts,
                    method=run,
                )

            grid_pts = eval3d.get_dense_3D_grid(vox, (lo, hi))
            occ, attn_xy = eval3d.occupancy_grid_with_attn(
                decode_fn, grid_pts, batch_size=batch_size, vox_res=vox,
                tile_points=S * S,
            )
            level = occ.reshape(batch_size, S, S, S)
            keys = jax.random.split(key, batch_size)
            pts = jax.vmap(
                lambda lv, k: sample_surface_points(lv, k, num_points)
            )(level, keys)
            world = pts / S * (hi - lo) + lo
            return out, level, world, attn_xy

        self._recon_attn_cache[cache_key] = recon
        return recon

    def _brute_force_fn(self, batch_size, mesh=None, training=True):
        """Batched, mesh-sharded brute-force alignment (replaces the per-
        sample Python loop; reference protocol eval_3D.py:140-170).

        Posture matches the decode path (`hier_final`): *final* metric runs
        (``training=False``) use the exact exhaustive search by default —
        every rotation scored with the full fp32 Chamfer, exactly the
        reference protocol — while in-training validation keeps the
        coarse-to-fine pruning (~27x less NN work; selection identical on
        every tested field, but unproven as a statistical bound). Setting
        ``eval.bf_prune`` explicitly applies that pruning everywhere.
        """
        mesh = mesh or self._eval_mesh(batch_size)
        key = (batch_size, bool(training), self._mesh_key(mesh))
        if key in self._bf_cache:
            return self._bf_cache[key]
        opt = self.opt
        prune = opt.eval.get("bf_prune")
        if prune is None and training:
            prune = (1024, 128)
        fn = eval3d.make_brute_force_batch(
            mesh=mesh,
            thresholds=tuple(opt.eval.f_thresholds),
            prune=tuple(prune) if prune else None,
            fast_coarse=bool(opt.eval.get("bf_fast_coarse", True)),
        )
        self._bf_cache[key] = fn
        return fn

    # -- training ----------------------------------------------------------------
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
        self._profiler_close()  # a run shorter than the profile schedule
        self.save_checkpoint(ep=self.ep, it=self.it)
        if self.tb:
            self.tb.flush()
        log_print("TRAINING DONE")
        log_print("Best CD: %.4f @ epoch %d" % (self.best_val, self.best_ep))

    def train_epoch(self):
        opt = self.opt
        self.train_loader.set_epoch(self.ep)
        log_print(f"training epoch {self.ep + 1}")
        profiling = opt.get("debug") and opt.get("profile")
        self._reset_step_clock()  # don't charge epoch setup/eval to s_it
        for batch, sharded in prefetch_to_device(
            self._epoch_batches(), self.mesh, select=model_batch
        ):
            if profiling:
                self._profiler_schedule()
            self.train_iteration(batch, sharded)
        self._flush_loss_buf()
        if (self.ep + 1) % opt.freq.eval == 0:
            log_print(f"validating epoch {self.ep + 1}")
            current_val = self.evaluate(ep=self.ep + 1, training=True)
            if current_val < self.best_val:
                self.best_val = current_val
                self.best_ep = self.ep + 1
                self.save_checkpoint(ep=self.ep, it=self.it, best=True, latest=True)

    # profiler schedule: wait 3, warmup 3, active 5, repeat 2 — the
    # reference's torch.profiler schedule (shape_engine.py:201-224). Each
    # active window lands in its own subdirectory of debug/profiler_log so
    # the two traces are separately loadable; the run exits after window 2.
    PROFILE_WAIT, PROFILE_WARMUP, PROFILE_ACTIVE, PROFILE_REPEAT = 3, 3, 5, 2

    def _profiler_schedule(self):
        cycle = self.PROFILE_WAIT + self.PROFILE_WARMUP + self.PROFILE_ACTIVE
        step = getattr(self, "_prof_step", 0)
        self._prof_step = step + 1
        window, phase = divmod(step, cycle)
        if window >= self.PROFILE_REPEAT:
            self._profiler_close()
            log_print("profiler traces written to debug/profiler_log; exiting")
            raise SystemExit(0)
        if phase == self.PROFILE_WAIT + self.PROFILE_WARMUP:
            # warmup steps ran untraced (backend paging/compile settles);
            # the active window starts now
            self._flush_loss_buf()  # drain queued work out of the window
            logdir = os.path.join("debug", "profiler_log", f"window_{window}")
            os.makedirs(logdir, exist_ok=True)
            jax.profiler.start_trace(logdir)
            self._prof_tracing = True
        elif phase == 0 and getattr(self, "_prof_tracing", False):
            self._flush_loss_buf()  # the traced steps must complete in-window
            jax.profiler.stop_trace()
            self._prof_tracing = False
            log_print(f"profiler window {window - 1} captured")

    def _profiler_close(self):
        """Finish an open trace window: drain queued device work first so the
        traced steps' execution lands inside the window, then stop. Called
        from the schedule's exit branch and from train()'s end, so a run
        shorter than the full schedule still writes its last window."""
        if getattr(self, "_prof_tracing", False):
            self._flush_loss_buf()
            jax.profiler.stop_trace()
            self._prof_tracing = False

    def train_iteration(self, batch, sharded=None):
        opt = self.opt
        if sharded is None:
            sharded = shard_batch(model_batch(batch), self.mesh)
        rng = jax.random.fold_in(jax.random.PRNGKey(opt.get("seed", 0) or 0), self.it)
        scalar_it = self.it % opt.freq.scalar == 0 and not opt.get("debug")
        step_fn = self.train_step_metrics if scalar_it else self.train_step
        self.state, metrics = step_fn(self.state, sharded, rng)
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
            if "dpc" in batch:
                self._log_train_shape_metrics(batch, it)
        if it % opt.freq.print == 0:
            log_print(
                f"Train Iter {it}/{self.num_batches * opt.max_epoch}: "
                f"{self.train_metric_logger}"
            )
        if not opt.get("debug"):
            if opt.freq.get("vis") and it % opt.freq.vis == 0:
                self.visualize_train_batch(batch, it)
            # reference stretches the dump cadence 10x per 10k iters
            # (shape_engine.py:290)
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

    # -- evaluation ----------------------------------------------------------------
    def evaluate(self, ep, training=False):
        """Test-set evaluation (reference shape_engine.py:335-515).

        Multi-process-correct by construction: each process's loader yields
        its contiguous slice of every global batch (uneven tails are padded
        to the full global batch so valid samples form a global prefix),
        ``shard_batch`` assembles the true global batch on the mesh, and
        per-sample metrics come back replicated (the reference's all_gather,
        shape_engine.py:413-429) so every process computes identical global
        summaries. Artifact dumps cover each process's own rows; result
        files are written by process 0.
        """
        opt = self.opt
        eval_bs = opt.eval.batch_size
        n_proc = jax.process_count()
        is_main = jax.process_index() == 0
        local_bs = eval_bs // max(n_proc, 1)
        mesh = self._eval_mesh(eval_bs)
        recon = self._recon_fn(eval_bs, mesh=mesh, training=training)
        score = self._score_fn(eval_bs, mesh=mesh)
        flip = opt.data.dataset_test == "pix3d"
        gt_view_fn = self._gt_view_fn(eval_bs, mesh, flip)
        from zeroshape_tpu.parallel.mesh import replicate_to_host

        metric_logger = MetricLogger(delimiter="  ")
        cd_accs, cd_comps, f_scores, cat_indices = [], [], [], []
        results_file = None
        if not training and is_main:
            results_file = open(
                os.path.join(
                    opt.output_path, f"{opt.data.dataset_test}_full_results.txt"
                ),
                "w",
            )
            results_file.write("IND, CD, ACC, COMP, ")
            results_file.write(
                ", ".join(
                    f"F-score@{t * 100:.2f}" for t in opt.eval.f_thresholds
                )
            )

        N = len(self.test_data)
        import time as _time

        t_prev = _time.perf_counter()
        for it, batch in enumerate(self.test_loader):
            # valid rows of this GLOBAL batch: the loader walks the dataset
            # in order, so batch `it` covers rows [it*eval_bs, ...) and
            # everything past N is padding (loader repeats for multi-process
            # tails, _pad_batch for single-process ones)
            B0 = min(eval_bs, N - it * eval_bs)
            batch_p = _pad_batch(batch, local_bs)
            dev = shard_batch(
                {
                    **model_batch(batch_p),
                    "dpc_points": np.asarray(
                        batch_p["dpc"]["points"], np.float32
                    ),
                    "idx": np.asarray(batch_p["idx"], np.int32),
                    "category_label": np.asarray(
                        batch_p["category_label"], np.int32
                    ),
                },
                mesh,
            )
            key = jax.random.fold_in(jax.random.PRNGKey(7), it)
            out, level, pred_world = recon(self.variables(), model_batch(dev), key)
            gt_view = gt_view_fn(dev["dpc_points"], dev["pose_gt"])
            if opt.eval.get("brute_force"):
                res = self._brute_force_fn(eval_bs, mesh=mesh, training=training)(
                    pred_world, gt_view
                )
                accs, comps, fs = res["acc"], res["comp"], res["f_score"]
                pred_n, gt_n = res["pc_pred"], res["pc_gt"]
            else:
                accs, comps, fs, pred_n, gt_n = score(pred_world, gt_view)
            # one host transfer for everything small; under multi-process it
            # is the metric all-gather (replicate_to_host)
            small = {
                "acc": accs, "comp": comps, "f": fs,
                "idx": dev["idx"], "cat": dev["category_label"],
            }
            if "hier_n_active" in out:
                small["hier_n_active"] = out["hier_n_active"]
            small = replicate_to_host(small, mesh)
            self._check_hier_overflow(small, training)
            accs, comps, fs = small["acc"], small["comp"], small["f"]
            cd_accs.append(accs[:B0])
            cd_comps.append(comps[:B0])
            f_scores.append(fs[:B0])
            cat_indices.append(small["cat"][:B0])
            t_now = _time.perf_counter()
            metric_logger.update(
                ACC=accs[:B0].mean(), COMP=comps[:B0].mean(),
                CD=(accs[:B0].mean() + comps[:B0].mean()) / 2,
                s_smp=(t_now - t_prev) / B0,
            )
            t_prev = t_now
            if it % opt.freq.print_eval == 0:
                log_print(
                    f"Eval Iter {it}/{len(self.test_loader)} @ EP {ep}: {metric_logger}"
                )
            if results_file is not None:
                for b in range(B0):
                    results_file.write(
                        "\n{:d}\t{:.4f}\t{:.4f}\t{:.4f}\t".format(
                            int(small["idx"][b]),
                            (accs[b] + comps[b]) / 2,
                            accs[b],
                            comps[b],
                        )
                        + "\t".join(f"{fs[b][i]:.4f}" for i in range(fs.shape[1]))
                    )
                results_file.flush()
            if not training:
                self._dump_eval_batch(batch_p, out, level, pred_n, gt_n, ep, B0)
            if it == 0 and training and is_main:
                self._dump_viz(ep)

        cd_accs = np.concatenate(cd_accs)
        cd_comps = np.concatenate(cd_comps)
        f_scores = np.concatenate(f_scores)
        cat_indices = np.concatenate(cat_indices)
        assert cd_accs.shape[0] == N
        if results_file is not None:
            results_file.close()

        dist_acc, dist_cov = cd_accs.mean(), cd_comps.mean()
        val_metric = (dist_acc + dist_cov) / 2
        log_print(f"CD. ACC: {dist_acc:.4f}, COMP: {dist_cov:.4f}")
        if training:
            self.log_scalar("eval/dist_acc", dist_acc, ep)
            self.log_scalar("eval/dist_cov", dist_cov, ep)
        elif is_main:
            self._write_summaries(cd_accs, cd_comps, f_scores, cat_indices, val_metric)
        return float(val_metric)

    def _dump_eval_batch(self, batch_p, out, level, pred_n, gt_n, ep, B0):
        """Per-sample artifact dumps for a final-eval batch.

        Single-process: everything is addressable — dump the valid prefix.
        Multi-process: big outputs stay sharded; each process extracts its
        own contiguous row block and dumps the rows that fall inside the
        valid global prefix (the reference dumps per rank the same way,
        shape_engine.py:379-387).
        """
        if jax.process_count() == 1:
            self.dump_results(batch_p, out, level, pred_n, gt_n, ep, B0)
            return
        from zeroshape_tpu.parallel.mesh import addressable_rows, local_valid_rows

        _, level_l, n_valid = local_valid_rows(level, B0)
        _, pred_l = addressable_rows(pred_n)
        _, gt_l = addressable_rows(gt_n)
        out_l = {}
        for k, v in out.items():
            if (
                hasattr(v, "addressable_shards")
                and getattr(v, "ndim", 0) >= 1
                and v.shape[0] == level.shape[0]
            ):
                out_l[k] = addressable_rows(v)[1]
        if n_valid > 0:
            self.dump_results(batch_p, out_l, level_l, pred_l, gt_l, ep, n_valid)

    def _write_summaries(self, cd_accs, cd_comps, f_scores, cat_indices, val_metric):
        opt = self.opt
        with open(os.path.join(opt.output_path, "cd_cat.txt"), "w") as outfile:
            outfile.write("CD     Acc    Comp   Count Cat\n")
            for i in range(opt.data.get("num_classes_test", len(self.test_data.label2cat))):
                sel = cat_indices == i
                if sel.sum() == 0 or i >= len(self.test_data.label2cat):
                    continue
                acc_i, comp_i = cd_accs[sel].mean(), cd_comps[sel].mean()
                outfile.write(
                    "%.4f %.4f %.4f %5d %s\n"
                    % ((acc_i + comp_i) / 2, acc_i, comp_i, sel.sum(),
                       self.test_data.label2cat[i])
                )
        f_avg = f_scores.mean(axis=0)
        print("##############################")
        for i, t in enumerate(opt.eval.f_thresholds):
            print("F-score @ %.2f: %.4f" % (t * 100, f_avg[i]))
        print("##############################")
        with open(
            os.path.join(opt.output_path, f"quantitative_{opt.data.dataset_test}.txt"),
            "w",
        ) as outfile:
            outfile.write("CD     Acc    Comp \n")
            outfile.write(
                "%.4f %.4f %.4f\n" % (val_metric, cd_accs.mean(), cd_comps.mean())
            )
            for i, t in enumerate(opt.eval.f_thresholds):
                outfile.write("F-score @ %.2f: %.4f\n" % (t * 100, f_avg[i]))
        vis.create_gif_html(
            os.path.join(opt.output_path, f"dump_{opt.data.dataset_test}"),
            os.path.join(opt.output_path, "results_test.html"),
            skip_every=10,
        )

    def dump_results(self, batch, out, level, pred_n, gt_n, ep, B0, train=False, folder=None):
        opt = self.opt
        if folder is None:
            folder = f"dump_{opt.data.dataset_test}" if not train else f"vis_{ep}"
        idx = np.asarray(batch["idx"])[:B0]
        vis.dump_images(
            opt.output_path, idx, "image_input",
            np.asarray(batch["rgb_input_map"])[:B0], folder=folder,
        )
        vis.dump_images(
            opt.output_path, idx, "mask_input",
            np.asarray(batch["mask_input_map"])[:B0], folder=folder,
        )
        meshes = [
            marching_cubes_mesh(np.asarray(level[b])) for b in range(B0)
        ]
        lo, hi = opt.eval.range
        S = opt.eval.vox_res + 1
        meshes = [(v / S * (hi - lo) + lo, f) for v, f in meshes]
        vis.dump_meshes(opt.output_path, idx, "mesh", meshes, folder=folder)
        # turntable GIFs (reference dumps one per eval sample through
        # pyrender, shape_engine.py:579 -> util_vis.py:348-405). The
        # device-side splat renderer (ops/render.py) makes per-sample
        # turntables affordable, so final eval covers EVERY sample like the
        # reference; eval.dump_mesh_viz=False disables, True also covers
        # in-training validation dumps.
        dump_viz = opt.eval.get("dump_mesh_viz")
        if (dump_viz is None and not train) or dump_viz:
            sel = list(range(B0))
        else:
            sel = []
        if sel:
            vis.dump_meshes_viz(
                opt.output_path, idx[sel], "mesh_viz",
                [meshes[b] for b in sel], folder=folder,
            )
        if "depth_pred" in out:
            vis.dump_depths(
                opt.output_path, idx, "depth_est",
                np.asarray(out["depth_pred"])[:B0],
                np.asarray(batch["mask_input_map"])[:B0],
                rescale=True, folder=folder,
            )
        vis.dump_pointclouds_compare(
            opt.output_path, idx, "pointclouds_comp",
            np.asarray(pred_n)[:B0], np.asarray(gt_n)[:B0], folder=folder,
        )

    def _log_train_shape_metrics(self, batch, it):
        """Train-split Chamfer at the scalar cadence (reference log_scalars'
        train branch runs eval_metrics on the current train batch,
        shape_engine.py:526-529). Decodes the first eval.batch_size samples —
        reusing the compiled eval reconstruction instead of compiling a
        train-batch-sized variant — and logs train/dist_acc, train/dist_cov.
        """
        opt = self.opt
        k = opt.eval.batch_size
        n_proc = jax.process_count()
        k_local = k // max(n_proc, 1)
        if k_local == 0 or batch["rgb_input_map"].shape[0] < k_local:
            return
        mesh = self._eval_mesh(k)
        sub = {key: batch[key][:k_local] for key in MODEL_KEYS if key in batch}
        sub["dpc_points"] = np.asarray(batch["dpc"]["points"][:k_local], np.float32)
        dev = shard_batch(sub, mesh)
        recon = self._recon_fn(k, mesh=mesh, training=True)
        key = jax.random.fold_in(jax.random.PRNGKey(13), it)
        out, level, pred_world = recon(self.variables(), model_batch(dev), key)
        gt_view = self._gt_view_fn(k, mesh, flip=False)(dev["dpc_points"], dev["pose_gt"])
        accs, comps, _, _, _ = self._score_fn(k, mesh=mesh)(pred_world, gt_view)
        self.log_scalar("train/dist_acc", float(np.mean(np.asarray(accs))), it)
        self.log_scalar("train/dist_cov", float(np.mean(np.asarray(comps))), it)

    def _check_hier_overflow(self, out, training=True):
        """Capacity overflow in the coarse-to-fine decode: warn once during
        in-training validation, fail hard when it would corrupt reported
        metrics (a dropped active cell silently under-refines the surface)."""
        if "hier_n_active" not in out:
            return
        opt = self.opt
        cap = eval3d.resolve_hier_capacity(
            opt.eval.vox_res, opt.eval.get("hier_capacity")
        )
        n_active = int(np.max(np.asarray(out["hier_n_active"])))
        if n_active <= cap:
            return
        msg = (
            f"hier_decode active cells ({n_active}) exceed eval.hier_capacity "
            f"({cap}); surface may be under-refined. Raise eval.hier_capacity "
            "or use the dense decode (--eval.hier_final! / --eval.hier_decode!)."
        )
        if not training:
            raise RuntimeError(msg)
        if not getattr(self, "_hier_warned", False):
            self._hier_warned = True
            log_print("WARNING: " + msg)

    def _dump_viz(self, ep):
        opt = self.opt
        if not self.viz_data:
            return
        log_print("visualizing and saving results...")
        self._dump_viz_samples(f"vis_{ep}", ep)
        vis.create_gif_html(
            os.path.join(opt.output_path, f"vis_{ep}"),
            os.path.join(opt.output_path, f"results_ep{ep}.html"),
            skip_every=1,
        )

    def _dump_viz_samples(self, folder, ep):
        """Per-viz-sample dumps incl. the attention GIF and seen-surface
        comparison (reference shape_engine.py:296-319, 393-405; attention
        assembly utils/eval_3D.py:47-81)."""
        opt = self.opt
        recon = self._recon_attn_fn(1)
        feat_res = opt.H // opt.arch.win_size
        vox = opt.eval.vox_res
        for sample in self.viz_data:
            key = jax.random.PRNGKey(int(np.asarray(sample["idx"])[0]))
            out, level, pred_world, attn_xy = recon(
                self.variables(), model_batch(sample), key
            )
            pred_n = eval3d.normalize_pc(pred_world)
            if "dpc" in sample:
                gt_view = eval3d.transform_gt_to_view(
                    jnp.asarray(sample["dpc"]["points"]),
                    jnp.asarray(sample["pose_gt"]),
                    flip_xy=opt.data.dataset_test == "pix3d",
                )
                gt_n = eval3d.normalize_pc(gt_view)
            else:
                gt_n = pred_n
            self.dump_results(
                sample, out, level, pred_n, gt_n, ep, 1, train=True, folder=folder
            )
            idx = np.asarray(sample["idx"])[:1]
            frames = eval3d.attention_frames(
                np.asarray(attn_xy[0]),
                np.asarray(sample["rgb_input_map"])[0],
                vox,
                feat_res,
            )
            vis.dump_attentions(opt.output_path, idx, "attn", [frames], folder=folder)
            if "gt_surf_points" in out and "seen_points" in out:
                vis.dump_pointclouds_compare(
                    opt.output_path, idx, "seen_surface",
                    np.asarray(out["seen_points"])[:1],
                    np.asarray(out["gt_surf_points"])[:1],
                    folder=folder,
                )

    def vis_train_iter(self):
        """Periodic training-time viz dumps into vis_log/iter_{it}
        (reference shape_engine.py:290-291, 299-318; rank 0 only)."""
        if not self.viz_data or jax.process_index() != 0:
            return
        self._dump_viz_samples(os.path.join("vis_log", f"iter_{self.it}"), self.ep)

    def visualize_train_batch(self, batch, step):
        """TensorBoard image grids from the current train batch (reference
        Runner.visualize, shape_engine.py:546-562, wired at freq.vis — the
        reference ships this call commented out for the shape task; here the
        flag is live)."""
        if self.tb is None:
            return
        if self._viz_fwd is None:
            model = self.model
            self._viz_fwd = jax.jit(
                lambda v, b: model.apply(v, b, train=False, with_supervision=False)
            )
        out = self._viz_fwd(self.variables(), model_batch(batch))
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
        if "depth_input_map" in batch:
            vis.tb_image(
                self.tb, step, "train", "depth_input_map",
                np.asarray(batch["depth_input_map"]), num_images=ni,
            )




