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
