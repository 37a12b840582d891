"""Calibrate the accuracy-gate bound from multiple seeds (VERDICT r4 #7).

Runs the exact gate recipe (tests/test_accuracy_gate.py: 24-epoch
from-scratch training on a 4-object analytic set, Chamfer-scored) for N
seeds in one process and prints per-seed best CD plus the mean + 3*sigma
bound the test should assert against. The random-init floor on this dataset
is ~0.155; the stored bound must sit well below it while clearing run-to-run
draw variance.

Usage: python scripts/calibrate_gate.py [n_seeds=3]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_seed(seed, tmp, data_root):
    import numpy as np

    from test_accuracy_gate import gate_yaml
    from zeroshape_tpu.config import Config, set_options
    from zeroshape_tpu.data.base import default_collate
    from zeroshape_tpu.runtime.shape_engine import Runner

    class _P:
        def __init__(self, root):
            self.root = root

        def __truediv__(self, name):
            return _P(os.path.join(self.root, name))

        def write_text(self, text):
            with open(self.root, "w") as f:
                f.write(text)

        def __str__(self):
            return self.root

    work = os.path.join(tmp, f"seed{seed}")
    os.makedirs(work, exist_ok=True)
    yaml_path = gate_yaml(_P(work), data_root)
    opt = set_options(
        Config({"yaml": yaml_path, "seed": seed, "name": f"accgate_s{seed}"}),
        safe_check=False,
    )

    runner = Runner(opt)
    runner.load_dataset()
    runner.build_networks()
    runner.setup_optimizer(default_collate([runner.train_data[0]]))
    runner.restore_checkpoint()
    runner.train()
    assert np.isfinite(runner.best_val)
    return float(runner.best_val)


def main():
    import numpy as np

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from zeroshape_tpu.data.analytic import generate_dataset

    tmp = tempfile.mkdtemp(prefix="gate_cal_")
    data_root = os.path.join(tmp, "data")
    # identical to the gate fixture (tests/test_accuracy_gate.py)
    generate_dataset(
        data_root, n_objects=4, n_views=6, H=64, seed=0,
        n_pc_points=2048, n_sdf_points=4096, val_views=1,
    )

    cds = []
    for seed in range(n_seeds):
        t0 = time.time()
        cd = run_seed(seed, tmp, data_root)
        cds.append(cd)
        print(f"seed {seed}: best CD {cd:.4f} ({time.time()-t0:.0f} s)", flush=True)

    cds = np.asarray(cds)
    mu, sd = cds.mean(), cds.std(ddof=1) if len(cds) > 1 else 0.0
    print(f"\nseeds: {[round(c, 4) for c in cds.tolist()]}")
    print(f"mean {mu:.4f}, sigma {sd:.4f}")
    print(f"suggested CD_BOUND = mean + 3*sigma = {mu + 3 * sd:.4f} "
          f"(random-init floor ~0.155)")


if __name__ == "__main__":
    main()
