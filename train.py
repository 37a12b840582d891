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


OMNIDATA_URL = (
    "https://www.dropbox.com/s/bua998sjhdizn6b/omnidata_dpt_depth_v2.ckpt?dl=1"
)


def stage_omnidata_weights(opt):
    """Fetch the omnidata DPT weights if configured but absent (reference
    train.py:34-36). Download failures are reported but non-fatal here — the
    engine's pretrained staging raises with guidance if the file still
    doesn't exist when it is actually needed."""
    path = opt.arch.depth.get("pretrained")
    pre = (opt.get("pretrain") or {}).get("depth")
    if not path or os.path.exists(path) or pre:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    print(f"downloading omnidata weights to {path}...")
    try:
        import urllib.request

        tmp = path + ".part"
        urllib.request.urlretrieve(OMNIDATA_URL, tmp)
        os.replace(tmp, path)
    except Exception as e:  # no network / URL rot: surface and continue
        print(f"WARNING: omnidata download failed ({e}); place the file at {path}")


def main():
    # multi-host (DCN) setup: only when launched under a multi-process
    # coordinator; single-host multi-chip needs nothing here
    from zeroshape_tpu.parallel.mesh import init_multihost_from_env

    init_multihost_from_env()

    opt_cmd = parse_arguments(sys.argv[1:])
    opt = set_options(opt_cmd, verbose=True, safe_check=True)
    save_options_file(opt)
    stage_omnidata_weights(opt)

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
