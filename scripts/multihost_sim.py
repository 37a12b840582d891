"""Two-process multi-host simulation of the distributed training AND
evaluation paths.

Executes, for real, the code that only multi-node hardware would otherwise
exercise (TRAINING.md "Scaling"): ``jax.distributed.initialize`` with a TCP
coordinator, per-process loader slicing (``DataLoader(process_index,
process_count)`` — the reference's DistributedSampler role,
reference data/base.py:11-26), global-batch assembly via
``jax.make_array_from_process_local_data`` (parallel/mesh.py:shard_batch),
one SPMD train step whose gradient all-reduce crosses the process boundary,
and a full evaluation pass through the REAL ``evaluate.py`` CLI (the
``ZEROSHAPE_MULTIHOST`` entry hook) whose per-sample metrics are gathered
across processes (parallel/mesh.py:replicate_to_host — the reference
all_gathers them, model/shape_engine.py:413-429, and evaluates multi-rank
through its CLI, reference evaluate.py:24-38).

Usage (from the repo root, CPU only — no TPU required):
    python scripts/multihost_sim.py            # both: train step + eval pass
    python scripts/multihost_sim.py train      # train-step sim only
    python scripts/multihost_sim.py eval       # evaluation sim only
    python scripts/multihost_sim.py worker M I # internal: mode M, process I

Each process hosts 4 virtual CPU devices -> a global 8-device data mesh.
Success: both processes print the SAME finite loss (train) / the SAME global
CD over the full uneven test set (eval: 10 samples through batches of 8,
exercising the padded-tail masking) and exit 0.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 4


def _port() -> int:
    """Workers read the coordinator port the parent picked; the parent binds
    port 0 so concurrent/back-to-back runs never collide on a fixed port."""
    given = os.environ.get("MULTIHOST_SIM_PORT")
    if given:
        return int(given)
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _init_dist(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        + " --xla_cpu_collective_timeout_seconds=3600"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("ZEROSHAPE_NO_JAX_CACHE", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{os.environ['MULTIHOST_SIM_PORT']}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.local_device_count() == DEV_PER_PROC


def worker_train(pid: int) -> None:
    _init_dist(pid)
    import jax
    import numpy as np

    sys.path.insert(0, REPO)
    from __graft_entry__ import _batch, _tiny_opt
    from zeroshape_tpu.models import graph_shape
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.parallel import train as ptrain
    from zeroshape_tpu.parallel.mesh import make_mesh, shard_batch

    n_global = N_PROC * DEV_PER_PROC
    opt = _tiny_opt().freeze()
    model = ShapeGraph.from_opt(opt)
    mesh = make_mesh(n_global)

    # every process generates the same GLOBAL batch (seeded), then keeps its
    # contiguous per-process slice — exactly what DataLoader(process_index,
    # process_count) yields in a real multi-host run
    B = n_global
    global_batch = _batch(B=B, H=opt.H, n_pts=16)
    lo = pid * (B // N_PROC)
    hi = lo + B // N_PROC
    local_batch = {k: np.asarray(v)[lo:hi] for k, v in global_batch.items()}

    # init from the same seed on every process -> replicated params agree
    init_local = {k: v[:1] for k, v in local_batch.items()}
    state = ptrain.create_train_state(model, opt, init_local, jax.random.PRNGKey(0))
    step = ptrain.make_train_step(model, opt, graph_shape.compute_loss, mesh)

    sharded = shard_batch(local_batch, mesh)  # make_array_from_process_local_data
    gshape = jax.tree.leaves(sharded)[0].shape
    assert gshape[0] == B, f"global batch dim {gshape[0]} != {B}"

    state, metrics = step(state, sharded, jax.random.PRNGKey(2))
    loss = float(jax.device_get(metrics["loss_all"]))
    assert np.isfinite(loss), loss
    print(f"[proc {pid}] multihost step OK: loss_all={loss:.6f}", flush=True)


class _P:
    """Pathlib-free stand-in for tiny_yaml's tmp_path arg."""

    def __init__(self, root):
        self.root = root

    def __truediv__(self, name):
        return _P(os.path.join(self.root, name))

    def write_text(self, text):
        with open(self.root, "w") as f:
            f.write(text)

    def __str__(self):
        return self.root


def _spawn(mode: str) -> None:
    procs = []
    env = dict(os.environ)
    env["MULTIHOST_SIM_PORT"] = str(_port())
    if mode == "eval":
        # the eval sim launches the REAL evaluate.py CLI per process (the
        # reference evaluates multi-rank through its CLI, evaluate.py:24-38):
        # the ZEROSHAPE_MULTIHOST entry hook, per-process loader slices, the
        # sharded recon/score program, replicated metric gather, padded-tail
        # exclusion, and rank-0 result files are all exercised end-to-end
        import tempfile

        work = tempfile.mkdtemp(prefix="mh_eval_")
        sys.path.insert(0, REPO)
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from test_engine_integration import make_fixture_dataset, tiny_yaml

        # 10 val samples -> batches of 8: one full batch + an uneven tail
        make_fixture_dataset(os.path.join(work, "data"), n_objects=10,
                             imgs_per_object=2, H=64)
        yaml_path = tiny_yaml(_P(work), os.path.join(work, "data"))
        env.update(
            ZEROSHAPE_MULTIHOST="1",
            ZEROSHAPE_COORD=f"localhost:{env['MULTIHOST_SIM_PORT']}",
            ZEROSHAPE_NPROC=str(N_PROC),
            ZEROSHAPE_PLATFORM="cpu",
            ZEROSHAPE_NO_JAX_CACHE="1",
            XLA_FLAGS=(
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
                + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
                + " --xla_cpu_collective_timeout_seconds=3600"
            ).strip(),
        )
        B = N_PROC * DEV_PER_PROC  # both meshes span the 8 global devices
        cmds = [
            [
                sys.executable, os.path.join(REPO, "evaluate.py"),
                f"--yaml={yaml_path}", f"--batch_size={B}",
                f"--eval.batch_size={B}",
            ]
            for _ in range(N_PROC)
        ]
    else:
        cmds = [
            [sys.executable, os.path.abspath(__file__), "worker", mode, str(pid)]
            for pid in range(N_PROC)
        ]
    for pid in range(N_PROC):
        penv = dict(env)
        if mode == "eval":
            penv["ZEROSHAPE_PROCID"] = str(pid)
        procs.append(
            subprocess.Popen(
                cmds[pid],
                env=penv,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    # an external `timeout`/Ctrl-C kills only this parent; reap the workers
    # too or they spin forever waiting on the dead coordinator
    import signal

    def _reap(signum, frame):
        for q in procs:
            q.kill()
        sys.exit(128 + signum)

    signal.signal(signal.SIGTERM, _reap)
    signal.signal(signal.SIGINT, _reap)
    token = "loss_all=" if mode == "train" else "CD. ACC:"
    vals = []
    failed = False
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=3000)
        except subprocess.TimeoutExpired:
            for q in procs:  # don't leak the peer on a hang
                q.kill()
            raise
        print(f"----- proc {pid} [{mode}] (rc={p.returncode}) -----")
        print(out[-2000:])
        if p.returncode != 0:
            failed = True
        for line in out.splitlines():
            if token not in line:
                continue
            if mode == "train":
                vals.append(float(line.split(token)[1]))
            else:  # "... CD. ACC: <acc>, COMP: <comp>" from evaluate.py
                acc = float(line.split("CD. ACC:")[1].split(",")[0])
                comp = float(line.split("COMP:")[1])
                vals.append((acc + comp) / 2)
    if failed or len(vals) != N_PROC:
        raise SystemExit(f"multihost {mode} sim FAILED")
    assert abs(vals[0] - vals[1]) < 1e-6, vals
    print(f"multihost {mode} sim OK: both processes agree, {token}{vals[0]:.6f}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        mode, pid = sys.argv[2], int(sys.argv[3])
        assert mode == "train", "eval workers are the real evaluate.py CLI"
        worker_train(pid)
        return

    modes = [sys.argv[1]] if len(sys.argv) > 1 else ["train", "eval"]
    for mode in modes:
        _spawn(mode)


if __name__ == "__main__":
    main()
