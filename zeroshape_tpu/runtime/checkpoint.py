"""Checkpointing: orbax-native store + torch ``.ckpt`` importer.

On-disk semantics follow the reference (utils/util.py:212-277): a checkpoint
carries {epoch, iter, best_val, best_ep, graph weights, optimizer state},
written as ``latest.ckpt`` periodically, copied to ``best.ckpt`` on
validation improvement, and ``checkpoint/ep{N}.ckpt`` snapshots. Here the
payload is an orbax/msgpack pytree directory instead of a torch pickle.

``convert_torch_checkpoint`` imports the reference's released ``.ckpt``
files (depth.ckpt / shape.ckpt, torch state_dicts) into our flax param /
batch-stats trees via a total key mapping, so released weights drive the TPU
model directly. Partial ("--load") restores reuse the same machinery as the
reference's child-prefix filtering (utils/util.py:201-239).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp


# ---------------------------------------------------------------------------
# Native (orbax) checkpoints
# ---------------------------------------------------------------------------

def _ckptr():
    return ocp.PyTreeCheckpointer()


def _replace_dir(tmp, path):
    """Swap ``tmp`` into place at ``path`` without a destructive window.

    The old checkpoint is renamed aside (cheap) before ``tmp`` moves in, so a
    crash at any point leaves either the old or the new checkpoint restorable
    (``restore_checkpoint`` falls back to the ``.old`` sibling); the
    expensive rmtree happens only after the new one is in place.
    """
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def save_checkpoint(output_path, state, ep, it, best_val, best_ep, latest=False, best=False):
    """Reference util.py:252-277 layout: latest.ckpt / best.ckpt / checkpoint/ep{N}.ckpt.

    Writes go to a ``.tmp`` sibling first and are renamed into place, so a
    crash mid-save never destroys the previous resumable checkpoint (the
    reference's torch.save has the same overwrite hazard; we do better).
    ``best.ckpt`` is a byte copy of the just-written checkpoint, matching the
    reference's shutil.copyfile (util.py:272-274) instead of re-serializing.
    """
    payload = {
        "epoch": np.int64(ep),
        "iter": np.int64(it),
        "best_val": np.float64(best_val),
        "best_ep": np.int64(best_ep),
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    name = "latest.ckpt" if latest else f"checkpoint/ep{ep}.ckpt"
    path = os.path.join(os.path.abspath(output_path), name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _ckptr().save(tmp, payload)
    _replace_dir(tmp, path)
    if best:
        best_path = os.path.join(os.path.abspath(output_path), "best.ckpt")
        tmp = best_path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(path, tmp)
        _replace_dir(tmp, best_path)
    return path


def restore_checkpoint(path, state=None):
    """Restore a payload; with ``state`` given, restores typed against it."""
    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        # a crash mid-_replace_dir left only the renamed-aside previous
        # checkpoint; it is complete and valid — restore from it
        path = path + ".old"
    if state is not None:
        template = {
            "epoch": np.int64(0),
            "iter": np.int64(0),
            "best_val": np.float64(0),
            "best_ep": np.int64(0),
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
        }
        payload = _ckptr().restore(path, item=template)
    else:
        payload = _ckptr().restore(path)
    return payload


def apply_payload(state, payload, restore_optim=True):
    new = state.replace(
        params=jax.tree.map(
            lambda t, s: np.asarray(s, t.dtype) if hasattr(t, "dtype") else s,
            state.params,
            payload["params"],
        ),
        batch_stats=payload["batch_stats"],
    )
    if restore_optim and "opt_state" in payload:
        restored = payload["opt_state"]
        if jax.tree.structure(restored) != jax.tree.structure(state.opt_state):
            # a structure mismatch means the payload was restored without the
            # state template (orbax returns nested dicts whose leaf iteration
            # order need not match the optax NamedTuple field order); grafting
            # flat leaves would silently put Adam moments in the wrong slots
            raise ValueError(
                "optimizer-state structure mismatch: restore the checkpoint "
                "with restore_checkpoint(path, state) so opt_state is typed "
                "against the live optimizer"
            )
        new = new.replace(opt_state=restored, step=np.int64(payload["iter"]))
    return new


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------

def _t_linear(w):
    return np.transpose(w, (1, 0))


def _t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _bn_entries(prefix):
    """(flax subpath under the BatchNorm module, torch suffix, kind)."""
    return [
        (("scale",), f"{prefix}.weight", "param"),
        (("bias",), f"{prefix}.bias", "param"),
        (("mean",), f"{prefix}.running_mean", "stat"),
        (("var",), f"{prefix}.running_var", "stat"),
    ]


class _Mapper:
    """Accumulates flax<->torch assignments and materializes the trees."""

    def __init__(self, state_dict):
        self.sd = {k: np.asarray(v) for k, v in state_dict.items()}
        self.params: Dict[tuple, np.ndarray] = {}
        self.stats: Dict[tuple, np.ndarray] = {}
        self.consumed = set()
        self.missing = []

    def take(self, torch_key, transform=None):
        if torch_key not in self.sd:
            self.missing.append(torch_key)
            return None
        self.consumed.add(torch_key)
        v = self.sd[torch_key]
        return transform(v) if transform else v

    def param(self, path, torch_key, transform=None):
        v = self.take(torch_key, transform)
        if v is not None:
            self.params[tuple(path)] = v

    def stat(self, path, torch_key):
        v = self.take(torch_key)
        if v is not None:
            self.stats[tuple(path)] = v

    def linear(self, path, torch_prefix, bias=True):
        self.param(path + ("kernel",), f"{torch_prefix}.weight", _t_linear)
        if bias:
            self.param(path + ("bias",), f"{torch_prefix}.bias")

    def conv(self, path, torch_prefix, bias=True, wrapped=True):
        """Our Conv module nests an nn.Conv named 'conv'; raw nn.Conv doesn't."""
        sub = path + ("conv",) if wrapped else path
        self.param(sub + ("kernel",), f"{torch_prefix}.weight", _t_conv)
        if bias:
            self.param(sub + ("bias",), f"{torch_prefix}.bias")

    def norm(self, path, torch_prefix):  # LayerNorm / GroupNorm
        self.param(path + ("scale",), f"{torch_prefix}.weight")
        self.param(path + ("bias",), f"{torch_prefix}.bias")

    def bn(self, path, torch_prefix):
        """flax BatchNorm wrapped as <path>/bn with batch_stats mean/var."""
        for sub, tk, kind in _bn_entries(torch_prefix):
            if kind == "param":
                self.param(path + ("bn",) + sub, tk)
            else:
                self.stat(path + ("bn",) + sub, tk)

    def bottleneck_conv(self, path, torch_prefix):
        self.conv(path + ("linear1",), f"{torch_prefix}.linear1", bias=False)
        self.bn(path + ("bn1",), f"{torch_prefix}.bn1")
        self.conv(path + ("linear2",), f"{torch_prefix}.linear2", bias=False)
        self.bn(path + ("bn2",), f"{torch_prefix}.bn2")

    def vit_block(self, path, torch_prefix):
        self.norm(path + ("norm1",), f"{torch_prefix}.norm1")
        self.linear(path + ("attn", "qkv"), f"{torch_prefix}.attn.qkv")
        self.linear(path + ("attn", "proj"), f"{torch_prefix}.attn.proj")
        self.norm(path + ("norm2",), f"{torch_prefix}.norm2")
        self.linear(path + ("mlp", "fc1"), f"{torch_prefix}.mlp.fc1")
        self.linear(path + ("mlp", "fc2"), f"{torch_prefix}.mlp.fc2")


def _map_resnetv2(m, path, tp):
    """timm ResNetV2 hybrid stem (stages 3/4/9)."""
    m.param(path + ("stem_conv", "kernel"), f"{tp}.stem.conv.weight", _t_conv)
    m.norm(path + ("stem_norm", "gn"), f"{tp}.stem.norm")
    for s, n_blocks in enumerate((3, 4, 9)):
        for b in range(n_blocks):
            bp = path + (f"stage{s}_{b}",)
            tb = f"{tp}.stages.{s}.blocks.{b}"
            for ci in (1, 2, 3):
                m.param(bp + (f"conv{ci}", "kernel"), f"{tb}.conv{ci}.weight", _t_conv)
                m.norm(bp + (f"norm{ci}", "gn"), f"{tb}.norm{ci}")
            if b == 0:
                m.param(
                    bp + ("downsample_conv", "kernel"),
                    f"{tb}.downsample.conv.weight",
                    _t_conv,
                )
                m.norm(bp + ("downsample_norm", "gn"), f"{tb}.downsample.norm")


def _map_hybrid_vit(m, path, tp):
    _map_resnetv2(m, path + ("backbone",), f"{tp}.patch_embed.backbone")
    m.param(path + ("patch_embed_proj", "kernel"), f"{tp}.patch_embed.proj.weight", _t_conv)
    m.param(path + ("patch_embed_proj", "bias"), f"{tp}.patch_embed.proj.bias")
    m.param(path + ("cls_token",), f"{tp}.cls_token")
    m.param(path + ("pos_embed",), f"{tp}.pos_embed")
    for i in range(12):
        m.vit_block(path + (f"block{i}",), f"{tp}.blocks.{i}")
    m.norm(path + ("norm",), f"{tp}.norm")


def _map_dpt_depth(m, path, tp):
    """DPTDepthModel: tp is e.g. 'dpt_depth' or '' (omnidata raw)."""
    dot = "." if tp else ""
    dpt = path + ("dpt",)
    _map_hybrid_vit(m, dpt + ("pretrained",), f"{tp}{dot}pretrained.model")
    for tap, tname in (("act3", "act_postprocess3"), ("act4", "act_postprocess4")):
        m.linear(dpt + (f"{tap}_readout", "project"), f"{tp}{dot}pretrained.{tname}.0.project.0")
        m.conv(dpt + (f"{tap}_conv",), f"{tp}{dot}pretrained.{tname}.3")
    m.conv(dpt + ("act4_down",), f"{tp}{dot}pretrained.act_postprocess4.4")
    for n in range(1, 5):
        m.conv(dpt + (f"layer{n}_rn",), f"{tp}{dot}scratch.layer{n}_rn", bias=False)
        rp = dpt + (f"refinenet{n}",)
        trp = f"{tp}{dot}scratch.refinenet{n}"
        for u in (1, 2):
            if n == 4 and u == 1:
                # refinenet4 takes a single input (dpt_depth.py:83), so its
                # first residual unit exists in the torch module but is never
                # executed; consume its weights without mapping them.
                for c in (1, 2):
                    m.take(f"{trp}.resConfUnit{u}.conv{c}.weight")
                    m.take(f"{trp}.resConfUnit{u}.conv{c}.bias")
                continue
            m.conv(rp + (f"res_conv_unit{u}", "conv1"), f"{trp}.resConfUnit{u}.conv1")
            m.conv(rp + (f"res_conv_unit{u}", "conv2"), f"{trp}.resConfUnit{u}.conv2")
        m.conv(rp + ("out_conv",), f"{trp}.out_conv")
    m.conv(path + ("head_conv1",), f"{tp}{dot}scratch.output_conv.0")
    m.conv(path + ("head_conv2",), f"{tp}{dot}scratch.output_conv.2")
    m.conv(path + ("head_conv3",), f"{tp}{dot}scratch.output_conv.4", wrapped=False)


def _map_resnet50(m, path, tp):
    """torchvision resnet50 trunk."""
    m.param(path + ("conv1", "kernel"), f"{tp}.conv1.weight", _t_conv)
    m.bn(path + ("bn1",), f"{tp}.bn1")
    for s, n_blocks in enumerate((3, 4, 6, 3)):
        for b in range(n_blocks):
            bp = path + (f"layer{s + 1}_{b}",)
            tb = f"{tp}.layer{s + 1}.{b}"
            for ci in (1, 2, 3):
                m.conv(bp + (f"conv{ci}",), f"{tb}.conv{ci}", bias=False)
                m.bn(bp + (f"bn{ci}",), f"{tb}.bn{ci}")
            if b == 0:
                m.conv(bp + ("downsample_conv",), f"{tb}.downsample.0", bias=False)
                m.bn(bp + ("downsample_bn",), f"{tb}.downsample.1")


def _map_coord_encoder(m, path, tp):
    _map_resnet50(m, path + ("encoder",), f"{tp}.encoder")
    m.bottleneck_conv(path + ("fc_bottleneck1",), f"{tp}.encoder.fc.0")
    m.bottleneck_conv(path + ("fc_bottleneck2",), f"{tp}.encoder.fc.1")
    m.linear(path + ("fc_linear",), f"{tp}.encoder.fc.2")
    m.bottleneck_conv(path + ("feat_bottleneck1",), f"{tp}.depth_feat_proj.0")
    m.bottleneck_conv(path + ("feat_bottleneck2",), f"{tp}.depth_feat_proj.1")
    m.conv(path + ("feat_proj",), f"{tp}.depth_feat_proj.2", wrapped=False)


def _map_implicit(m, path, tp, n_blocks=2, n_mlp_linears=9):
    m.linear(path + ("point_proj",), f"{tp}.point_proj.proj")
    m.linear(path + ("latent_proj",), f"{tp}.latent_proj")
    m.take(f"{tp}.pos_embed")  # fixed sincos buffer; we bake it as a constant
    for i in range(n_blocks):
        bp = path + (f"block{i}",)
        tb = f"{tp}.blocks_attn.{i}"
        m.norm(bp + ("norm1",), f"{tb}.norm1")
        m.linear(bp + ("qkv",), f"{tb}.attn.qkv")
        m.linear(bp + ("proj",), f"{tb}.attn.proj")
        m.norm(bp + ("norm2",), f"{tb}.norm2")
        m.linear(bp + ("mlp", "fc1"), f"{tb}.mlp.fc1")
        m.linear(bp + ("mlp", "fc2"), f"{tb}.mlp.fc2")
    m.norm(path + ("norm",), f"{tp}.norm")
    for l in range(n_mlp_linears):
        m.linear(path + ("impl_mlp", f"lin{l}"), f"{tp}.impl_mlp.layers.{l}")


def _map_intr_head(m, path, head_prefix, proj_prefix):
    m.bottleneck_conv(path + ("bottleneck1",), f"{head_prefix}.0")
    m.bottleneck_conv(path + ("bottleneck2",), f"{head_prefix}.1")
    m.linear(path + ("proj",), proj_prefix)


def convert_torch_state_dict(
    state_dict: Dict[str, Any],
    graph: str = "shape",
    impl_blocks: int = 2,
    impl_mlp_linears: int = 9,
) -> Tuple[dict, dict, dict]:
    """Map a reference torch state_dict onto our flax trees.

    Args:
      state_dict: torch name -> array (the ``checkpoint['graph']`` dict, or an
        omnidata ``model_state_dict`` when graph == 'omnidata_dpt').
      graph: 'shape' | 'depth' | 'omnidata_dpt'.
    Returns:
      (params tree, batch_stats tree, report dict with 'missing'/'unconsumed').
    """
    m = _Mapper(state_dict)
    if graph == "omnidata_dpt":
        _map_dpt_depth(m, ("dpt_depth",), "")
    else:
        _map_dpt_depth(m, ("dpt_depth",), "dpt_depth")
        _map_intr_head(m, ("intr_head",), "intr_head", "intr_proj")
        if graph == "shape":
            _map_coord_encoder(m, ("coord_encoder",), "coord_encoder")
            _map_implicit(
                m, ("impl_network",), "impl_network", impl_blocks, impl_mlp_linears
            )

    def unflatten(flat):
        tree: dict = {}
        for path, v in flat.items():
            node = tree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = v
        return tree

    # num_batches_tracked buffers carry no weights
    aux = {k for k in m.sd if k.endswith("num_batches_tracked")}
    unconsumed = sorted(set(m.sd) - m.consumed - aux)
    report = {"missing": sorted(set(m.missing)), "unconsumed": unconsumed}
    return unflatten(m.params), unflatten(m.stats), report


def load_torch_checkpoint(path, graph="shape", **kw):
    """Load a reference ``.ckpt`` (torch pickle) and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "graph" in ckpt:
        sd = {k: v.numpy() for k, v in ckpt["graph"].items()}
        meta = {k: ckpt.get(k) for k in ("epoch", "iter", "best_val", "best_ep")}
    elif "model_state_dict" in ckpt:
        sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
        graph = "omnidata_dpt"
        meta = {}
    else:
        sd = {k: v.numpy() for k, v in ckpt.items()}
        meta = {}
    params, stats, report = convert_torch_state_dict(sd, graph=graph, **kw)
    return params, stats, report, meta


def _load_pretrain_subtrees(path, graph, keys):
    """Load (params, batch_stats) subtrees named ``keys`` from a checkpoint.

    ``path`` may be a reference torch ``.ckpt`` file (converted via the key
    mapping) or one of our orbax checkpoint directories (e.g. the stage-1
    run's ``best.ckpt``).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained checkpoint not found: {path!r}. Stage-1 weights must "
            "exist before shape training (reference train.py:34-36 auto-"
            "downloads omnidata; depth.ckpt comes from the depth pretrain "
            "run). Unset the config key to train from scratch explicitly."
        )
    if os.path.isdir(path):
        # orbax/tensorstore requires an absolute directory; configs naturally
        # carry run-relative paths like output/depth/depth_gen/best.ckpt
        payload = _ckptr().restore(os.path.abspath(path))
        params_all = payload.get("params", {})
        stats_all = payload.get("batch_stats", {}) or {}
        missing = [k for k in keys if k not in params_all]
        if missing:
            raise KeyError(
                f"checkpoint {path} lacks required subtrees {missing}; has "
                f"{sorted(params_all)}"
            )
        params = {k: params_all[k] for k in keys}
        stats = {k: stats_all[k] for k in keys if k in stats_all}
    else:
        params, stats, report, _ = load_torch_checkpoint(path, graph=graph)
        bad = report["missing"]
        if bad:
            raise ValueError(
                f"torch checkpoint {path} is missing {len(bad)} expected keys "
                f"(first: {bad[:5]}); refusing a partial pretrained load "
                "(reference load_state_dict is strict, graph_shape.py:75-80)"
            )
        absent = [k for k in keys if k not in params]
        if absent:
            raise KeyError(
                f"converted checkpoint {path} lacks required subtrees "
                f"{absent} (is this the right kind of checkpoint?)"
            )
        params = {k: params[k] for k in keys}
        stats = {k: stats[k] for k in keys if k in stats}
    return params, stats


def stage_pretrained(state, opt, graph="shape", log=print):
    """Load pretrained weights into a freshly-initialized train state.

    Reference semantics (graph_shape.load_pretrained_depth,
    model/compute_graph/graph_shape.py:69-87, and graph_depth.__init__,
    graph_depth.py:16-19):

      * shape graph: ``opt.pretrain.depth`` (a stage-1 depth-graph
        checkpoint) loads dpt_depth + intr_head (+ intr projection, which
        lives inside our IntrHead module); else ``opt.arch.depth.pretrained``
        (omnidata weights) loads dpt_depth only.
      * depth graph: ``opt.arch.depth.pretrained`` loads dpt_depth.

    A set-but-absent path raises (the silent alternative trains DPT from
    random init, which is a recipe-correctness hole, not a default).
    """
    pre = (opt.get("pretrain") or {}).get("depth") if graph == "shape" else None
    omni = opt.arch.depth.get("pretrained")
    if pre:
        log(f"loading pretrained dpt depth + intr head from {pre}...")
        params, stats = _load_pretrain_subtrees(
            pre, graph="depth", keys=("dpt_depth", "intr_head")
        )
    elif omni:
        log(f"loading pretrained dpt depth from {omni}...")
        params, stats = _load_pretrain_subtrees(
            omni, graph="omnidata_dpt", keys=("dpt_depth",)
        )
    else:
        return state
    new_params = merge_params(state.params, params)
    new_stats = (
        merge_params(state.batch_stats, stats) if stats else state.batch_stats
    )
    return state.replace(params=new_params, batch_stats=new_stats)


def merge_params(template, loaded, strict_shapes=True):
    """Graft loaded subtrees onto a template tree (partial '--load' restore)."""

    def merge(dst, src, path=()):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"unexpected param {'/'.join(path + (k,))}")
            if isinstance(v, dict):
                merge(dst[k], v, path + (k,))
            else:
                if strict_shapes and tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                dst[k] = np.asarray(v, dtype=dst[k].dtype)

    out = jax.tree.map(np.asarray, template)
    merge(out, loaded)
    return out
