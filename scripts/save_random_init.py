"""Save a random-init checkpoint for a yaml so `evaluate.py --ckpt=...` can
score the untrained floor through the production CLI (the "random init"
rows of BASELINE.md Runs A/B and the held-out-object generalization table).

Usage: python scripts/save_random_init.py --yaml=options/shape_gen.yaml \
           --name=shape_gen_rand
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from zeroshape_tpu.config import parse_arguments, set_options
    from zeroshape_tpu.data.base import default_collate

    opt_cmd = parse_arguments(sys.argv[1:])
    opt = set_options(opt_cmd, verbose=False, safe_check=False)

    import importlib

    task = os.path.basename(opt.yaml).split(".")[0].split("_")[0]
    engine = importlib.import_module(f"zeroshape_tpu.runtime.{task}_engine")
    runner = engine.Runner(opt)
    runner.load_dataset(eval_split="test", load_train=False)
    runner.build_networks()
    runner.setup_optimizer(default_collate([runner.test_data[0]]))
    runner.save_checkpoint(ep=0, it=0, best=True, latest=False)
    print(os.path.join(opt.output_path, "best.ckpt"))


if __name__ == "__main__":
    main()
