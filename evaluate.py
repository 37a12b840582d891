"""Evaluation CLI: ``python evaluate.py --yaml=options/shape.yaml --data.dataset_test=pix3d
[--ckpt=... | --resume] [--eval.brute_force] [--eval.vox_res=128]``.

Reference parity (evaluate.py:8-38): writes ``data_list.txt``, runs the full
test split, emits per-sample/per-category/summary result files.
"""

import importlib
import os
import sys

from zeroshape_tpu.config import parse_arguments, set_options
from zeroshape_tpu.data.base import default_collate


def main():
    # multi-host (DCN) setup, same hook as train.py: multi-rank evaluation
    # through the user-facing CLI (reference evaluate.py:24-38 spawns one
    # process per device exactly like its train.py)
    from zeroshape_tpu.parallel.mesh import init_multihost_from_env

    init_multihost_from_env()

    opt_cmd = parse_arguments(sys.argv[1:])
    opt = set_options(opt_cmd, verbose=True, safe_check=False)
    # test-set evaluation keeps one visualization sample (reference
    # evaluate.py:29 forces eval.n_vis = 1)
    opt = opt.unfrozen_copy()
    opt.eval.n_vis = 1
    opt = opt.freeze()

    task = os.path.basename(opt.yaml).split(".")[0].split("_")[0]
    engine = importlib.import_module(f"zeroshape_tpu.runtime.{task}_engine")

    runner = engine.Runner(opt)
    runner.load_dataset(eval_split="test", load_train=False)
    import jax

    if jax.process_index() == 0:  # single writer on a shared filesystem
        runner.test_data.id_filename_mapping(
            opt, os.path.join(opt.output_path, "data_list.txt")
        )
    runner.build_networks()
    init_batch = default_collate([runner.test_data[0]])
    runner.setup_optimizer(init_batch)
    if opt.get("ckpt"):
        runner.load_weights(opt.ckpt)
    else:
        runner.restore_checkpoint(best=True, evaluate=True)
    runner.setup_visualizer(test=True)
    runner.evaluate(ep=0, training=False)


if __name__ == "__main__":
    main()
