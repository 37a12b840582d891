"""Two-process multi-host simulation of the distributed training path.

Executes, for real, the code that only multi-node hardware would otherwise
exercise (TRAINING.md "Scaling"): ``jax.distributed.initialize`` with a TCP
coordinator, per-process loader slicing (``DataLoader(process_index,
process_count)`` — the reference's DistributedSampler role,
reference data/base.py:11-26), global-batch assembly via
``jax.make_array_from_process_local_data`` (parallel/mesh.py:shard_batch),
and one SPMD train step whose gradient all-reduce crosses the process
boundary.

Usage (from the repo root, CPU only — no TPU required):
    python scripts/multihost_sim.py            # coordinator: spawns 2 procs
    python scripts/multihost_sim.py worker I   # internal: process I

Each process hosts 4 virtual CPU devices -> a global 8-device data mesh.
Success: both processes print the SAME finite loss (the all-reduced value)
and exit 0.
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


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        + " --xla_cpu_collective_timeout_seconds=3600"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{os.environ['MULTIHOST_SIM_PORT']}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.local_device_count() == DEV_PER_PROC

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


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return

    procs = []
    env = dict(os.environ)
    env["MULTIHOST_SIM_PORT"] = str(_port())
    for pid in range(N_PROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "worker", str(pid)],
                env=env,
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
    losses = []
    failed = False
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:  # don't leak the peer on a hang
                q.kill()
            raise
        print(f"----- proc {pid} (rc={p.returncode}) -----")
        print(out[-2000:])
        if p.returncode != 0:
            failed = True
        for line in out.splitlines():
            if "loss_all=" in line:
                losses.append(float(line.split("loss_all=")[1]))
    if failed or len(losses) != N_PROC:
        raise SystemExit("multihost sim FAILED")
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    print(f"multihost sim OK: both processes agree, loss_all={losses[0]:.6f}")


if __name__ == "__main__":
    main()
