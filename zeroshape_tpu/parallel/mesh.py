"""Device mesh and sharding helpers.

The reference scales with one-process-per-GPU DDP (train.py:41-45, NCCL
all-reduce). TPU-native equivalent: a single-controller SPMD program over a
``jax.sharding.Mesh`` with the batch sharded along a ``data`` axis; XLA
inserts the gradient all-reduce over ICI automatically. The mesh is 1-D for
pure data parallelism but carries named axes so tensor/sequence sharding can
be layered on later without touching call sites.
"""

from __future__ import annotations


import jax
import numpy as np
from typing import Optional
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost_from_env() -> bool:
    """Initialize ``jax.distributed`` when launched under a multi-process
    coordinator (``ZEROSHAPE_MULTIHOST=1``) — the entry-point hook shared by
    train.py and evaluate.py (the reference evaluates multi-rank through its
    CLI the same way it trains, reference evaluate.py:24-38, train.py:41-45).

    Explicit ``ZEROSHAPE_COORD`` / ``ZEROSHAPE_NPROC`` / ``ZEROSHAPE_PROCID``
    configure the rendezvous directly (manual launches and the 2-process CPU
    sim, scripts/multihost_sim.py); without them jax's cluster auto-detection
    handles the managed multi-host environments. ``ZEROSHAPE_PLATFORM`` pins
    the backend first — env vars alone do not override an ambient TPU
    platform registration (CLAUDE.md), so the sim sets it to ``cpu``.

    Must run before anything touches the jax backend. Returns True when
    distributed init ran.
    """
    import os

    if os.environ.get("ZEROSHAPE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ZEROSHAPE_PLATFORM"])
    if not os.environ.get("ZEROSHAPE_MULTIHOST"):
        return False
    kw = {}
    if os.environ.get("ZEROSHAPE_COORD"):
        kw = dict(
            coordinator_address=os.environ["ZEROSHAPE_COORD"],
            num_processes=int(os.environ["ZEROSHAPE_NPROC"]),
            process_id=int(os.environ["ZEROSHAPE_PROCID"]),
        )
    jax.distributed.initialize(**kw)
    return True


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def make_mesh_for_batch(
    batch_size: int, axis_name: str = "data", warn: bool = True
) -> Mesh:
    """Largest mesh (<= device count) whose size divides the global batch.

    The reference requires batch_size % world_size == 0 implicitly
    (shape_engine.py:33 divides); here an awkward batch degrades to fewer
    devices instead of crashing, with a warning.
    """
    n_dev = len(jax.devices())
    n = max(k for k in range(1, n_dev + 1) if batch_size % k == 0)
    if n < n_dev:
        if jax.process_count() > 1:
            # a shrunken mesh would exclude some processes' devices entirely,
            # and make_array_from_process_local_data cannot assemble a global
            # batch onto a mesh a feeding process does not participate in —
            # fail loudly instead of crashing later with an opaque error
            raise ValueError(
                f"batch_size={batch_size} must be a multiple of the global "
                f"device count ({n_dev}) in multi-process runs; a degraded "
                f"{n}-device mesh cannot span all processes."
            )
        if warn:
            import warnings

            warnings.warn(
                f"batch_size={batch_size} is not divisible by {n_dev} devices; "
                f"using a {n}-device data mesh. Pick a multiple of {n_dev} for "
                "full utilization."
            )
    return make_mesh(n, axis_name)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch pytree onto the mesh, sharded along axis 0.

    Single-host: a plain ``device_put`` of the global batch. Multi-host
    (``jax.process_count() > 1``, after ``jax.distributed.initialize``): each
    process passes only its *local* slice of the global batch (the loader's
    ``process_index``/``process_count`` sharding) and the global array is
    assembled with ``jax.make_array_from_process_local_data`` — a plain
    device_put cannot address other hosts' devices.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def prefetch_to_device(iterator, mesh: Mesh, select=None, depth: int = 1):
    """Yield ``(host_batch, sharded_batch)`` with transfers issued ``depth``
    batches ahead.

    JAX device transfers are asynchronous: issuing ``shard_batch`` for batch
    N+1 before batch N's step runs overlaps the host→device copy with the
    previous step's device compute. The reference gets this overlap from
    torch DataLoader workers + ``.cuda(non_blocking)``; here the loader
    prefetches host batches on threads and this generator extends the
    pipeline one stage onto the device. On the tunneled single-chip backend
    the transfer is a measurable slice of the step wall, so the overlap is
    load-bearing, not a nicety.

    ``select`` maps the host batch to the pytree that should go to the
    device (e.g. ``model_batch``); the full host batch is yielded alongside
    for host-side consumers (visualization, metric logging).
    """
    from collections import deque

    if select is None:
        select = lambda b: b
    queue = deque()
    for batch in iterator:
        queue.append((batch, shard_batch(select(batch), mesh)))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _gather_identity(t):
    return t


def replicate_to_host(tree, mesh: Mesh):
    """Full host-numpy values of (possibly multi-process-sharded) arrays.

    Single process: a plain transfer. Multi-process: an identity jit with
    replicated ``out_shardings`` — XLA all-gathers each leaf over the mesh
    so every process holds the complete value (the reference all_gathers
    per-sample eval metrics the same way, shape_engine.py:413-429). Intended
    for small leaves (per-sample metric rows), not activation-sized tensors.
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    rep = replicated(mesh)
    # _gather_identity is module-level so jit's compilation cache (keyed on
    # the function object + shardings + avals) hits across eval batches; a
    # fresh lambda per call would retrace and recompile every time
    tree = jax.jit(_gather_identity, out_shardings=rep)(tree)
    return jax.tree.map(np.asarray, tree)


def addressable_rows(x):
    """This process's contiguous row block of a leading-axis-sharded global
    array, as ``(start_row, numpy block)``.

    Multi-process evaluation keeps big per-sample outputs (level grids,
    point clouds) sharded; each process dumps artifacts only for the rows it
    owns (the reference's per-rank dumping, shape_engine.py:379-387).
    """
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    start = shards[0].index[0].start or 0
    stop = start
    blocks = []
    for s in shards:
        s_start = s.index[0].start or 0
        assert s_start == stop, (
            f"non-contiguous addressable shards at row {s_start} (expected {stop})"
        )
        data = np.asarray(s.data)
        stop = s_start + data.shape[0]
        blocks.append(data)
    return start, np.concatenate(blocks, axis=0)


def local_valid_rows(x, n_valid_global: int):
    """``(row0, local_block, n_valid_local)`` for a leading-axis-sharded
    global array whose valid rows are the global prefix
    ``[:n_valid_global]`` (eval tails are repeat-padded as a global suffix).

    ``n_valid_local`` is how many of this process's rows fall inside the
    valid prefix — the single place that carries the clip invariant both
    engines' artifact dumpers rely on.
    """
    row0, local = addressable_rows(x)
    return row0, local, int(np.clip(n_valid_global - row0, 0, local.shape[0]))


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k


def pad_batch(batch, target):
    """Edge-pad the batch's leading dim up to ``target`` rows.

    The single padding helper behind both the engines' eval-tail handling
    (padded rows are sliced off the outputs) and :func:`pad_batch_for_mesh`.
    """
    leaves = jax.tree.leaves(batch)
    B = leaves[0].shape[0]
    if B >= target:
        return batch
    pad = target - B

    def pad_leaf(x):
        x = np.asarray(x)
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, mode="edge")

    return jax.tree.map(pad_leaf, batch)


def pad_batch_for_mesh(batch, mesh: Mesh):
    """Pad the batch's leading dim to a mesh-size multiple; returns
    (padded batch, validity mask [B_padded]).

    Replaces the reference's auxiliary remainder loader
    (shape_engine.py:57-62,436-461): instead of a second single-process pass
    over the dataset tail, the tail batch is padded and masked.
    """
    n_dev = mesh.devices.size
    leaves = jax.tree.leaves(batch)
    B = leaves[0].shape[0]
    Bp = pad_to_multiple(B, n_dev)
    mask = np.concatenate(
        [np.ones((B,), np.float32), np.zeros((Bp - B,), np.float32)]
    )
    return pad_batch(batch, Bp), mask
