"""Headline benchmark: seconds per 128^3 single-image shape reconstruction.

Measures the full inference pipeline on one TPU chip — DPT depth +
intrinsics, visible-surface encoding, dense occupancy decode over the
(128+1)^3 query grid against cached latents, and area-uniform sampling of
10k surface points from the implicit isosurface — all inside one jitted
program (no host round-trips; the reference bounces the grid through the
CPU for PyMCubes, utils/eval_3D.py:114-117).

North-star (BASELINE.md): < 1 s/image at vox_res=128 on a v5e chip.
Prints one JSON line; vs_baseline is the speedup over that 1 s target.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt
from zeroshape_tpu.config import _enable_compilation_cache

_enable_compilation_cache()  # repeat bench launches skip the remote compile

BASELINE_SECONDS = 1.0  # north-star target from BASELINE.json
VOX_RES = 128
NUM_POINTS = 10000
CAPACITY = 4096  # refined-cell budget == engine default (round-5 calibrated
# on trained fields: peak measured demand 2533); overflow reported on stderr

# Trained weights, when available, replace the x25 logit-sharpening proxy
# below with the real thing (a trained BCE occupancy field and its real
# active-cell count). BENCH_CKPT overrides; otherwise the analytic-overfit
# run's best checkpoint is picked up automatically.
_REPO = os.path.dirname(os.path.abspath(__file__))
# Preference order: explicit override, then whichever trained run exists on
# disk (the overfit and the held-out-generalization recipes both produce
# saturated occupancy fields; either makes the bench realistic).
_CKPT_CANDIDATES = [
    os.path.join(_REPO, "output/shape/shape_overfit/best.ckpt"),
    os.path.join(_REPO, "output/shape/shape_gen_staged/best.ckpt"),
    os.path.join(_REPO, "output/shape/shape_gen/best.ckpt"),
]


def _find_ckpt():
    env = os.environ.get("BENCH_CKPT")
    for path in [env] if env else _CKPT_CANDIDATES:
        if path and os.path.isdir(path):
            return path
    return None


def _real_sample(H):
    """An analytic-scene rgb/mask at the bench resolution, if the generated
    overfit or generalization data is on disk; None otherwise."""
    root = os.environ.get("BENCH_DATA", "/tmp/overfit_data")
    if not os.path.isdir(os.path.join(root, "train_data")):
        root = "/tmp/gen_data"
    if not os.path.isdir(os.path.join(root, "train_data")):
        return None
    try:
        from zeroshape_tpu.config import Config
        from zeroshape_tpu.data.synthetic import Dataset

        opt = Config(
            {
                "H": H, "W": H, "image_size": [H, H],
                "data": {
                    "root": root, "bgcolor": 1, "num_workers": 0,
                    "num_classes_test": 15, "max_img_cat": None,
                    "dataset_train": "synthetic", "dataset_test": "synthetic",
                    "synthetic": {"subset": "analytic", "percentage": 1},
                },
                "training": {"n_sdf_points": 16},
            }
        )
        ds = Dataset(opt, split="train")
        s = ds[0]
        return {
            "rgb_input_map": jnp.asarray(s["rgb_input_map"])[None],
            "mask_input_map": jnp.asarray(s["mask_input_map"])[None],
        }
    except Exception as e:  # data layout drift must not kill the benchmark
        print(f"bench: analytic sample unavailable ({e}); using random input",
              file=sys.stderr)
        return None


def build(use_fused=None, attn_mode="grouped", tile=512):
    from zeroshape_tpu.metrics import eval3d
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.ops.marching_cubes import sample_surface_points_cells

    from zeroshape_tpu.models import resolve_compute_dtype

    opt = _full_opt()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    # same dtype policy as the production CLIs (arch.dtype: auto)
    model = ShapeGraph.from_opt(opt, dtype=resolve_compute_dtype(opt))
    batch = _batch(B=1, H=opt.H, n_pts=16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    infer_batch = {k: batch[k] for k in ("rgb_input_map", "mask_input_map")}

    sharpen = 25.0
    ckpt = _find_ckpt()
    if ckpt:
        try:
            from zeroshape_tpu.runtime import checkpoint as ckpt_util

            payload = ckpt_util.restore_checkpoint(ckpt)
            variables = {
                "params": ckpt_util.merge_params(variables["params"], payload["params"]),
                "batch_stats": ckpt_util.merge_params(
                    variables["batch_stats"], payload["batch_stats"]
                ),
            }
            # merged trees are host numpy; without this every rep re-uploads
            # all params (~15 s/call on the tunneled backend, 100x compute)
            variables = jax.device_put(variables)
            sharpen = 1.0  # a trained field is already saturated
            real = _real_sample(opt.H)
            if real is not None:
                infer_batch = real
            print(f"bench: trained weights from {ckpt} "
                  f"(epoch {payload.get('epoch')}, real input: {real is not None})",
                  file=sys.stderr)
        except Exception as e:  # an incompatible ckpt must not kill the bench
            print(f"bench: could not load {ckpt} ({e}); using sharpened "
                  "random init", file=sys.stderr)
            sharpen = 25.0

    S = VOX_RES + 1
    lo, hi = -1.5, 1.5

    from zeroshape_tpu.ops import implicit_kernel

    if use_fused is None:
        use_fused = on_tpu and implicit_kernel.fused_supported(opt)

    @jax.jit
    def reconstruct(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )

        # sharpen=25 (random init only): BCE-trained occupancy decoders
        # saturate (|logit| ~ O(10) away from the surface) while random-init
        # logits hover near 0, which marks EVERY coarse cell as
        # near-surface — a regime no trained model exhibits. The scale
        # keeps the architecture, FLOPs and zero-level set identical and
        # restores a production-like active-cell count. With trained
        # weights loaded, sharpen=1 (the field is real).
        if use_fused:
            # fused Pallas decoder (ops/implicit_kernel.py): whole decoder +
            # latent caches resident in VMEM; wins the hier-path A/B vs the
            # XLA decode (BASELINE.md)
            caches = model.apply(
                variables, out["latent_depth"],
                method=lambda mdl, l: mdl.impl_network.encode(l),
            )
            packed = implicit_kernel.pack_decoder_params(
                variables["params"]["impl_network"]
            )

            vmem = (
                100 * 1024 * 1024
                if (attn_mode != "blockdiag" or tile > 512)
                else None
            )

            def decode_fn(pts):
                occ = implicit_kernel.fused_decode(
                    pts[0], caches, packed, latent_len=caches[0][0].shape[2],
                    attn_mode=attn_mode, tile=tile, vmem_limit_bytes=vmem,
                )
                return sharpen * occ[None]

        else:

            def decode_fn(pts):
                def run(mdl, latent, p):
                    caches = mdl.impl_network.encode(latent)
                    occ, _ = mdl.impl_network.decode(caches, p)
                    return occ

                return sharpen * model.apply(
                    variables, out["latent_depth"], pts, method=run
                )

        # coarse-to-fine decode: exact same surface as the dense 129^3 pass
        # (tests/test_hierarchical_decode.py), ~4x less decoder work;
        # n_active is checked against the capacity after the run. Surface
        # sampling restricts the triangle-area pass to the active cells.
        level, n_active, cell_ids, cell_valid = eval3d.occupancy_grid_hierarchical(
            decode_fn, VOX_RES, (lo, hi), batch_size=1, capacity=CAPACITY,
            return_stats=True, return_cells=True,
        )
        pts = sample_surface_points_cells(
            level[0], cell_ids[0], cell_valid[0], key, NUM_POINTS
        )
        world = pts / S * (hi - lo) + lo
        return world, out["depth_pred"], out["intr_pred"], n_active

    return reconstruct, variables, infer_batch


def main():
    reconstruct, variables, batch = build()
    key = jax.random.PRNGKey(0)
    # compile + warmup; a host transfer (not just block_until_ready) is the
    # sync point so experimental PJRT backends can't report async dispatch
    world, depth, intr, n_active = reconstruct(variables, batch, key)
    _ = np.asarray(world)
    n_act = int(np.max(np.asarray(n_active)))
    if n_act > CAPACITY:
        print(
            f"WARNING: hier decode active cells ({n_act}) exceed capacity "
            f"({CAPACITY}); surface may be under-refined",
            file=sys.stderr,
        )

    reps = int(os.environ.get("BENCH_REPS", "9"))
    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        world, depth, intr, n_active = reconstruct(variables, batch, k)
        _ = np.asarray(world)
        times.append(time.perf_counter() - t0)
    latency = float(np.median(times))
    q1, q3 = np.percentile(times, [25, 75])
    print(
        f"bench: median {latency*1e3:.1f} ms over {reps} reps, "
        f"IQR [{q1*1e3:.1f}, {q3*1e3:.1f}] ms, "
        f"min {min(times)*1e3:.1f} / max {max(times)*1e3:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "shape_recon_latency_vox128",
                "value": round(latency, 4),
                "unit": "s/image",
                "vs_baseline": round(BASELINE_SECONDS / latency, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
