"""Training CLI: ``python train.py --yaml=options/shape.yaml [--key.sub=val]``.

Reference parity (train.py:10-48) minus multiprocess spawning: JAX is
single-controller SPMD, so one process drives the whole TPU mesh.
The engine (shape/depth) is chosen from the yaml basename, like the
reference's dynamic import (train.py:16).
"""

import importlib
import os
import sys

from zeroshape_tpu.config import parse_arguments, save_options_file, set_options
from zeroshape_tpu.data.base import default_collate


def main():
    # multi-host (DCN) setup: only when launched under a multi-process
    # coordinator; single-host multi-chip needs nothing here
    if os.environ.get("ZEROSHAPE_MULTIHOST"):
        import jax

        jax.distributed.initialize()

    opt_cmd = parse_arguments(sys.argv[1:])
    opt = set_options(opt_cmd, verbose=True, safe_check=True)
    save_options_file(opt)

    task = os.path.basename(opt.yaml).split(".")[0].split("_")[0]
    engine = importlib.import_module(f"zeroshape_tpu.runtime.{task}_engine")

    runner = engine.Runner(opt)
    runner.load_dataset()
    runner.build_networks()
    init_batch = default_collate([runner.train_data[0]])
    runner.setup_optimizer(init_batch)
    runner.restore_checkpoint()
    runner.setup_visualizer()
    runner.train()


if __name__ == "__main__":
    main()
