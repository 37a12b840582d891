import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.models import graph_shape
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.parallel import train as ptrain
from zeroshape_tpu.parallel.mesh import make_mesh, pad_batch_for_mesh, shard_batch

from test_graphs import tiny_batch, tiny_opt


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_param_group_labels():
    opt = tiny_opt()
    model = ShapeGraph.from_opt(opt)
    batch = tiny_batch()
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    labels = ptrain.param_group_labels(vars_["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    names = {"/".join(getattr(p, "key", str(p)) for p in path): lab for path, lab in flat}
    # DPT params are finetune; implicit decoder is scratch
    dpt = [v for k, v in names.items() if k.startswith("dpt_depth")]
    impl = [v for k, v in names.items() if k.startswith("impl_network")]
    intr = [v for k, v in names.items() if k.startswith("intr_head")]
    assert dpt and all(v.startswith("finetune") for v in dpt)
    assert intr and all(v.startswith("finetune") for v in intr)
    assert impl and all(v.startswith("scratch") for v in impl)
    # biases / 1-d params get nodecay
    assert names["impl_network/latent_proj/bias"] == "scratch_nodecay"
    assert names["impl_network/latent_proj/kernel"] == "scratch_decay"


def test_pad_batch_for_mesh():
    mesh = make_mesh()
    batch = {k: np.asarray(v) for k, v in tiny_batch(B=3).items()}
    padded, mask = pad_batch_for_mesh(batch, mesh)
    assert padded["rgb_input_map"].shape[0] == 8
    assert mask.sum() == 3 and mask.shape == (8,)


@pytest.mark.slow
def test_train_step_runs_and_descends():
    opt = tiny_opt()
    model = ShapeGraph.from_opt(opt)
    mesh = make_mesh()
    batch = tiny_batch(B=8)
    state = ptrain.create_train_state(model, opt_with_optim(opt), batch, jax.random.PRNGKey(0))
    step = ptrain.make_train_step(
        model, opt_with_optim(opt), graph_shape.compute_loss, mesh
    )
    sharded = shard_batch(batch, mesh)
    losses = []
    # fixed dropout rng: isolates optimization progress from drop-path noise
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        state, metrics = step(state, sharded, rng)
        losses.append(float(metrics["loss_all"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert min(losses[-3:]) < losses[0], losses  # descends on a fixed batch
    assert int(state.step) == 8


def test_fix_dpt_freezes_finetune_params():
    opt = opt_with_optim(tiny_opt())
    o = opt.unfrozen_copy()
    o.optim.fix_dpt = True
    model = ShapeGraph.from_opt(o)
    mesh = make_mesh()
    batch = tiny_batch(B=8)
    state = ptrain.create_train_state(model, o, batch, jax.random.PRNGKey(0))
    dpt_before = jax.tree.map(np.asarray, state.params["dpt_depth"])
    impl_before = jax.tree.map(np.asarray, state.params["impl_network"])
    step = ptrain.make_train_step(model, o, graph_shape.compute_loss, mesh)
    state, _ = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    # dpt unchanged
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)), dpt_before, state.params["dpt_depth"])
    assert all(jax.tree.leaves(same))
    # impl changed
    changed = jax.tree.map(lambda a, b: not np.array_equal(a, np.asarray(b)), impl_before, state.params["impl_network"])
    assert any(jax.tree.leaves(changed))


def opt_with_optim(opt):
    o = opt.unfrozen_copy()
    o.optim = {
        "lr": 1e-3,
        "lr_ft": 1e-4,
        "weight_decay": 0.05,
        "fix_dpt": False,
        "clip_norm": None,
        "accum": 1,
        "sched": False,
    }
    return o


def test_epoch_cosine_schedule():
    import jax.numpy as jnp

    sched = ptrain.epoch_cosine_schedule(1.0, max_epoch=10, steps_per_epoch=100)
    assert abs(float(sched(0)) - 1.0) < 1e-6  # epoch 0
    assert abs(float(sched(99)) - 1.0) < 1e-6  # still epoch 0
    assert abs(float(sched(500)) - 0.5) < 1e-6  # epoch 5: cos(pi/2)
    assert float(sched(999)) < 0.05  # epoch 9
    assert abs(float(sched(10_000))) < 1e-6  # clamped at max_epoch


def test_loader_process_slicing_partitions_global_batch():
    """Multi-host loader slices: each process holds a disjoint contiguous
    slice of every global batch, together covering it exactly."""
    from zeroshape_tpu.data.base import DataLoader

    class Ints:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"idx": np.int64(i)}

    per_proc = []
    for p in range(2):
        dl = DataLoader(
            Ints(), batch_size=8, shuffle=True, drop_last=True, num_workers=1,
            seed=3, process_index=p, process_count=2,
        )
        dl.set_epoch(1)
        per_proc.append([b["idx"] for b in dl])
    assert len(per_proc[0]) == len(per_proc[1]) == 3
    for b0, b1 in zip(*per_proc):
        assert b0.shape == b1.shape == (4,)
        merged = np.concatenate([b0, b1])
        assert len(set(merged.tolist())) == 8  # disjoint halves
    # deterministic shuffle: both processes drew from the same global order
    dl_global = DataLoader(
        Ints(), batch_size=8, shuffle=True, drop_last=True, num_workers=1, seed=3
    )
    dl_global.set_epoch(1)
    for (b0, b1), g in zip(zip(*per_proc), dl_global):
        np.testing.assert_array_equal(np.concatenate([b0, b1]), g["idx"])


def test_shard_batch_multihost_path_single_process(monkeypatch):
    """The make_array_from_process_local_data branch must reproduce the
    device_put sharding when there is one process."""
    from zeroshape_tpu.parallel import mesh as pmesh

    mesh = make_mesh(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    expected = pmesh.shard_batch(batch, mesh)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    got = pmesh.shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(expected["x"]))
    assert got["x"].sharding == expected["x"].sharding


def test_loader_uneven_tail_pads_across_processes():
    """drop_last=False with an uneven tail in multi-process runs must pad
    with repeats of the last row up to the FULL global batch, so the valid
    samples stay a contiguous global prefix and the engines can exclude
    every padded row from metrics by count alone."""
    from zeroshape_tpu.data.base import DataLoader

    class Ints:
        def __len__(self):
            return 13  # batch 6 -> tail of 1 over 2 procs

        def __getitem__(self, i):
            return {"idx": np.int64(i)}

    rows = {p: [] for p in range(2)}
    for p in range(2):
        dl = DataLoader(
            Ints(), batch_size=6, shuffle=False, drop_last=False, num_workers=1,
            seed=0, process_index=p, process_count=2,
        )
        for b in dl:
            rows[p].append(b["idx"])
    # every slice is exactly batch_size/process_count rows, tail included
    for b0, b1 in zip(rows[0], rows[1]):
        assert b0.shape == b1.shape == (3,)
    # the reassembled global tail batch is [12, 12, 12, 12, 12, 12]: the one
    # valid row is the global prefix, everything after row B0=1 is padding
    tail = np.concatenate([rows[0][-1], rows[1][-1]])
    np.testing.assert_array_equal(tail, np.full(6, 12))
    merged = np.concatenate([np.concatenate(rows[0]), np.concatenate(rows[1])])
    assert set(range(13)) <= set(merged.tolist())  # nothing dropped


def test_replicate_to_host_and_addressable_rows():
    from zeroshape_tpu.parallel import mesh as pmesh

    mesh = make_mesh(8)
    x = np.arange(24, dtype=np.float32).reshape(8, 3)
    sharded = pmesh.shard_batch({"x": x}, mesh)
    out = pmesh.replicate_to_host({"x": sharded["x"]}, mesh)
    np.testing.assert_array_equal(out["x"], x)
    start, block = pmesh.addressable_rows(sharded["x"])
    assert start == 0  # single process owns everything
    np.testing.assert_array_equal(block, x)


def test_brute_force_posture_exact_final_pruned_validation(monkeypatch):
    """Final metric runs (training=False) must default to the exhaustive
    search (prune=None); in-training validation keeps the pruned default;
    an explicit eval.bf_prune applies everywhere (PARITY.md posture)."""
    from zeroshape_tpu.config import Config
    from zeroshape_tpu.metrics import eval3d
    from zeroshape_tpu.runtime.shape_engine import Runner

    captured = []

    def fake_make(**kw):
        captured.append(kw)
        return lambda *a: None

    monkeypatch.setattr(eval3d, "make_brute_force_batch", fake_make)

    def runner_with(bf_prune):
        opt = Config(
            {"eval": {"f_thresholds": [0.01], "bf_prune": bf_prune,
                      "batch_size": 8}}
        )
        r = Runner.for_inference(opt, model=None)
        return r

    r = runner_with(None)
    mesh = make_mesh(8)
    r._brute_force_fn(8, mesh=mesh, training=False)
    r._brute_force_fn(8, mesh=mesh, training=True)
    assert captured[0]["prune"] is None
    assert captured[1]["prune"] == (1024, 128)
    r2 = runner_with([64, 8])
    r2._brute_force_fn(8, mesh=mesh, training=False)
    r2._brute_force_fn(8, mesh=mesh, training=True)
    assert captured[2]["prune"] == (64, 8)
    assert captured[3]["prune"] == (64, 8)


def test_cosine_schedule_counts_updates_under_accum():
    """With MultiSteps(accum=k), the schedule sees update counts, so the
    per-epoch step divisor must shrink by k or the anneal runs k times slow."""
    import jax.numpy as jnp
    import optax

    params = {"w": np.zeros((4, 4), np.float32)}
    tx = ptrain.make_optimizer(
        params, lr=1.0, accum=4, sched=(10, 100)  # 100 mini-batches/epoch
    )
    state = tx.init(params)
    # 25 updates = one epoch of 100 mini-batches at accum 4; feed 5 epochs of
    # updates and check the LR the inner adamw saw by probing the schedule
    sched = ptrain.epoch_cosine_schedule(1.0, 10, 100 // 4)
    assert abs(float(sched(5 * 25)) - 0.5) < 1e-6  # epoch 5 -> cos(pi/2)


def test_clip_norm_ignores_frozen_groups():
    """fix_dpt + clip_norm: frozen (finetune) grads must be zeroed BEFORE the
    global-norm clip, or they dominate ||g|| and over-clip the live groups."""
    params = {
        "dpt_depth": {"w": np.zeros((64, 64), np.float32)},
        "decoder": {"w": np.zeros((2, 2), np.float32)},
    }
    tx = ptrain.make_optimizer(params, lr=1.0, fix_dpt=True, clip_norm=1.0)
    state = tx.init(params)
    grads = {
        "dpt_depth": {"w": np.full((64, 64), 100.0, np.float32)},  # huge frozen grad
        "decoder": {"w": np.full((2, 2), 0.1, np.float32)},  # small live grad
    }
    updates, _ = tx.update(grads, state, params)
    # live grad norm is 0.2 < clip 1.0 -> must pass through unclipped into
    # adamw; adamw then normalizes by its moments, so check the frozen grads
    # did not shrink the live update toward zero
    live = np.asarray(updates["decoder"]["w"])
    assert np.all(np.abs(live) > 1e-3), live
    assert np.allclose(np.asarray(updates["dpt_depth"]["w"]), 0.0)


def test_make_mesh_for_batch_rejects_partial_mesh_multiprocess(monkeypatch):
    import jax
    import pytest

    from zeroshape_tpu.parallel import mesh as pmesh

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multiple of the global device count"):
        pmesh.make_mesh_for_batch(3)  # 8 devices, batch 3


def test_synthetic_sdf_subsample_deterministic(tmp_path):
    """Which SDF points a sample trains on must depend only on (seed, idx,
    epoch) — not on loader-thread scheduling (regression: a shared rng.spawn
    handed out children in thread-arrival order) or in-process visit
    counters (which a --resume cannot restore)."""
    from test_datasets import base_opt
    from test_engine_integration import make_fixture_dataset

    make_fixture_dataset(str(tmp_path))
    opt = base_opt(tmp_path)
    from zeroshape_tpu.data.synthetic import Dataset

    a = Dataset(opt, split="train")
    b = Dataset(opt, split="train")
    # visit the two datasets in OPPOSITE orders; per-sample draws must agree
    ia = [a[0], a[1]]
    ib = [b[1], b[0]][::-1]
    np.testing.assert_array_equal(
        ia[0]["gt_sample_points"], ib[0]["gt_sample_points"]
    )
    np.testing.assert_array_equal(
        ia[1]["gt_sample_sdf"], ib[1]["gt_sample_sdf"]
    )
    # re-reading the same sample within one epoch draws the SAME subset
    # (duplicated eval rows must agree), and the next epoch advances it
    a2 = a[0]
    np.testing.assert_array_equal(ia[0]["gt_sample_points"], a2["gt_sample_points"])
    a.set_epoch(1)
    a3 = a[0]
    assert not np.array_equal(ia[0]["gt_sample_points"], a3["gt_sample_points"])


def test_prefetch_to_device_order_select_and_lookahead():
    from zeroshape_tpu.parallel.mesh import prefetch_to_device

    mesh = make_mesh()
    issued = []  # batch indices whose transfer has been issued

    def select(b):
        issued.append(b["i"])
        return {"x": b["x"]}

    batches = [{"i": i, "x": np.full((8, 4), i, np.float32)} for i in range(5)]
    out = []
    for host, sharded in prefetch_to_device(iter(batches), mesh, select=select):
        # lookahead: when batch i is yielded, batch i+1's transfer is already
        # issued (except at the tail of the iterator)
        expect = min(host["i"] + 2, len(batches))
        assert len(issued) == expect
        assert set(sharded.keys()) == {"x"}  # select applied
        assert sharded["x"].sharding.is_equivalent_to(
            shard_batch({"x": batches[0]["x"]}, mesh)["x"].sharding, ndim=2
        )
        out.append((host["i"], float(np.asarray(sharded["x"])[0, 0])))
    assert out == [(i, float(i)) for i in range(5)]  # order + pairing preserved


def test_epoch_batches_applies_resume_skip():
    from zeroshape_tpu.runtime.engine_base import RunnerBase

    r = RunnerBase.__new__(RunnerBase)
    r.train_loader = [{"i": i} for i in range(6)]
    r.iter_skip = 2
    assert [b["i"] for b in r._epoch_batches()] == [2, 3, 4, 5]
    assert r.iter_skip == 0
    # next epoch: no skip left
    assert [b["i"] for b in r._epoch_batches()] == [0, 1, 2, 3, 4, 5]


def test_local_valid_rows_clip_invariant():
    """The per-process valid-row clip both engines' dumpers rely on: rows
    before B0 are valid, the repeat-padded global suffix is excluded."""
    from types import SimpleNamespace

    from zeroshape_tpu.parallel.mesh import local_valid_rows

    def fake_sharded(start, rows, total_cols=3):
        # mimic a jax.Array whose addressable shards are rows [start, start+rows)
        data = np.arange(start * total_cols, (start + rows) * total_cols)
        data = data.reshape(rows, total_cols).astype(np.float32)
        shard = SimpleNamespace(index=(slice(start, start + rows),), data=data)
        return SimpleNamespace(addressable_shards=[shard])

    # process owns rows 4..8 of a 8-row global batch
    row0, local, n = local_valid_rows(fake_sharded(4, 4), 8)  # no padding
    assert (row0, n) == (4, 4) and local.shape == (4, 3)
    _, _, n = local_valid_rows(fake_sharded(4, 4), 6)  # 2 padded rows
    assert n == 2
    _, _, n = local_valid_rows(fake_sharded(4, 4), 4)  # whole block is padding
    assert n == 0
    _, _, n = local_valid_rows(fake_sharded(0, 4), 2)  # first process, short B0
    assert n == 2
