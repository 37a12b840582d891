"""Measure hierarchical-decode active-cell counts on trained fields
(VERDICT round-4 #6: settle the hier-capacity question with data).

The coarse-to-fine decode refines up to ``capacity`` coarse cells
(eval3d.resolve_hier_capacity: default vox128 -> 8192 = 1/4 of the 32^3
coarse cells); bench.py historically advertised 4096. This script loads
trained checkpoints through the engine lifecycle, runs the hierarchical
recon over the test split, and prints the per-sample ``n_active``
distribution (cells the margin test marks BEFORE the capacity clamp) so the
shipped capacity can be justified by measured fields instead of guesses.

Extra checkpoints (``--extra_ckpts=path1,path2``) are scored in the SAME
process/Runner so the remote compile is paid once: the recon fn is cached
per (batch_size, mesh) in the Runner and params are swapped via
``load_weights``.

Usage (chip or CPU):
  python scripts/measure_hier.py --yaml=options/shape_gen.yaml \
      --name=shape_gen_staged --resume \
      --extra_ckpts=output/shape/shape_gen/best.ckpt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(runner, recon, eval_bs, mesh, label):
    import jax

    from zeroshape_tpu.parallel.mesh import replicate_to_host, shard_batch
    from zeroshape_tpu.runtime.shape_engine import model_batch, _pad_batch

    N = len(runner.test_data)
    counts = []
    for it, batch in enumerate(runner.test_loader):
        B0 = min(eval_bs, N - it * eval_bs)
        batch_p = _pad_batch(batch, eval_bs)
        dev = shard_batch(model_batch(batch_p), mesh)
        out, _, _ = recon(
            runner.variables(), dev, jax.random.fold_in(jax.random.PRNGKey(7), it)
        )
        assert "hier_n_active" in out, "hier decode did not run (vox_res % 4 != 0?)"
        n_act = replicate_to_host({"n": out["hier_n_active"]}, mesh)["n"]
        counts.extend(np.asarray(n_act)[:B0].tolist())
        print(f"[{label}] batch {it}: n_active {np.asarray(n_act)[:B0].tolist()}",
              flush=True)
    return np.asarray(counts)


def report(counts, vox, label):
    from zeroshape_tpu.metrics.eval3d import resolve_hier_capacity

    default_cap = resolve_hier_capacity(vox, None)
    print(f"\n[{label}] vox_res={vox}, coarse cells={(vox // 4) ** 3}, "
          f"engine default capacity={default_cap}")
    print(f"[{label}] samples: {len(counts)}")
    print(f"[{label}] n_active: min={counts.min()} "
          f"median={int(np.median(counts))} "
          f"p95={int(np.percentile(counts, 95))} max={counts.max()}")
    for cap in (2048, 4096, default_cap):
        over = int((counts > cap).sum())
        print(f"[{label}]   capacity {cap}: {over}/{len(counts)} samples "
              f"would overflow")


def main():
    from zeroshape_tpu.config import parse_arguments, set_options
    from zeroshape_tpu.data.base import default_collate
    from zeroshape_tpu.runtime.shape_engine import Runner

    opt_cmd = parse_arguments(sys.argv[1:])
    extra = [p for p in str(opt_cmd.pop("extra_ckpts", "") or "").split(",") if p]
    opt = set_options(opt_cmd, verbose=False, safe_check=False)
    opt = opt.unfrozen_copy()
    opt.eval.n_vis = 0
    # n_active is the margin test's RAW demand, counted before the capacity
    # clamp (eval3d.occupancy_grid_hierarchical return_stats), so the default
    # capacity measures demand fine. Do NOT raise hier_capacity to the full
    # coarse-cell budget: hier_decode_saves_work() then correctly reports the
    # hier decode as pointless and _recon_fn silently falls back to dense,
    # which returns no stats at all.
    vox = opt.eval.vox_res
    opt.eval.hier_decode = True
    opt = opt.freeze()

    runner = Runner(opt)
    runner.load_dataset(eval_split="test", load_train=False)
    runner.build_networks()
    runner.setup_optimizer(default_collate([runner.test_data[0]]))
    runner.restore_checkpoint(best=True, evaluate=True)

    eval_bs = opt.eval.batch_size
    mesh = runner._eval_mesh(eval_bs)
    recon = runner._recon_fn(eval_bs, mesh=mesh, training=True)

    label = opt.get("name") or "main"
    results = [(label, measure(runner, recon, eval_bs, mesh, label))]
    for path in extra:
        lab = os.path.basename(os.path.dirname(path)) or path
        print(f"\nswapping weights to {path} (compile cache retained)",
              flush=True)
        runner.load_weights(path)
        runner._device_put_state()
        results.append((lab, measure(runner, recon, eval_bs, mesh, lab)))

    for lab, counts in results:
        report(counts, vox, lab)


if __name__ == "__main__":
    main()
