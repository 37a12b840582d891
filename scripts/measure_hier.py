"""Measure hierarchical-decode active-cell counts on trained fields
(VERDICT round-4 #6: settle the hier-capacity question with data).

The coarse-to-fine decode refines up to ``capacity`` coarse cells
(eval3d.resolve_hier_capacity: default vox128 -> 8192 = 1/4 of the 32^3
coarse cells); bench.py historically advertised 4096. This script loads a
trained checkpoint through the engine lifecycle, runs the hierarchical
recon over the test split, and prints the per-sample ``n_active``
distribution (cells the margin test marks BEFORE the capacity clamp) so the
shipped capacity can be justified by measured fields instead of guesses.

Usage (chip or CPU):
  python scripts/measure_hier.py --yaml=options/shape_gen.yaml --resume
  python scripts/measure_hier.py --yaml=options/shape_overfit.yaml --resume \
      --eval.vox_res=128
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from zeroshape_tpu.config import parse_arguments, set_options
    from zeroshape_tpu.data.base import default_collate
    from zeroshape_tpu.metrics.eval3d import resolve_hier_capacity
    from zeroshape_tpu.parallel.mesh import replicate_to_host, shard_batch
    from zeroshape_tpu.runtime.shape_engine import Runner, model_batch, _pad_batch

    opt_cmd = parse_arguments(sys.argv[1:])
    opt = set_options(opt_cmd, verbose=False, safe_check=False)
    opt = opt.unfrozen_copy()
    opt.eval.n_vis = 0
    # measurement wants the margin test's raw demand, not a clamped top-k:
    # give the decode the full coarse-cell budget so n_active is never capped
    vox = opt.eval.vox_res
    opt.eval.hier_decode = True
    opt.eval.hier_capacity = (vox // 4) ** 3
    opt = opt.freeze()

    runner = Runner(opt)
    runner.load_dataset(eval_split="test", load_train=False)
    runner.build_networks()
    runner.setup_optimizer(default_collate([runner.test_data[0]]))
    runner.restore_checkpoint(best=True, evaluate=True)

    eval_bs = opt.eval.batch_size
    mesh = runner._eval_mesh(eval_bs)
    recon = runner._recon_fn(eval_bs, mesh=mesh, training=True)

    N = len(runner.test_data)
    counts = []
    for it, batch in enumerate(runner.test_loader):
        B0 = min(eval_bs, N - it * eval_bs)
        batch_p = _pad_batch(batch, eval_bs)
        dev = shard_batch(model_batch(batch_p), mesh)
        out, _, _ = recon(runner.variables(), dev, jax.random.fold_in(jax.random.PRNGKey(7), it))
        assert "hier_n_active" in out, "hier decode did not run (vox_res % 4 != 0?)"
        n_act = replicate_to_host({"n": out["hier_n_active"]}, mesh)["n"]
        counts.extend(np.asarray(n_act)[:B0].tolist())
        print(f"batch {it}: n_active {np.asarray(n_act)[:B0].tolist()}", flush=True)

    counts = np.asarray(counts)
    default_cap = resolve_hier_capacity(vox, None)
    print(f"\nvox_res={vox}, coarse cells={(vox // 4) ** 3}, "
          f"engine default capacity={default_cap}")
    print(f"samples: {len(counts)}")
    print(f"n_active: min={counts.min()} median={int(np.median(counts))} "
          f"p95={int(np.percentile(counts, 95))} max={counts.max()}")
    for cap in (2048, 4096, default_cap):
        over = int((counts > cap).sum())
        print(f"  capacity {cap}: {over}/{len(counts)} samples would overflow")


if __name__ == "__main__":
    main()
