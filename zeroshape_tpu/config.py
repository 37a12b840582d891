"""Configuration system: YAML trees + ``_parent_`` inheritance + dotted CLI overrides.

Reproduces the user-facing config semantics of the reference
(``utils/options.py:16-129`` in zxhuang1698/ZeroShape): YAML files may declare
``_parent_`` bases, command lines override with ``--a.b.c=value`` (``--flag`` /
``--flag!`` sugar for booleans), and the resulting tree is attribute-accessible.

TPU-first differences:
  * The config is *frozen* after :func:`finalize` so it can be closed over by
    jitted functions without retracing hazards.
  * No implicit CUDA/device fields; ``H``/``W`` are derived, and distributed
    setup is owned by :mod:`zeroshape_tpu.parallel`.
"""

from __future__ import annotations

import os
import random
import string
import copy
import yaml


class Config(dict):
    """Attribute-style nested dict (the reference's EasyDict, hardened).

    Mutable while being built; call :meth:`freeze` to make it read-only.
    """

    __frozen = False

    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v

    # -- dict/attr bridging -------------------------------------------------
    def __setitem__(self, key, value):
        if self.__frozen:
            raise AttributeError(f"Config is frozen; cannot set {key!r}")
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
        super().__setitem__(key, value)

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        if key.endswith("__frozen"):
            object.__setattr__(self, key, value)
        else:
            self[key] = value

    def __deepcopy__(self, memo):
        new = Config()
        for k, v in self.items():
            new[k] = copy.deepcopy(v, memo)
        return new

    # -- freezing ------------------------------------------------------------
    def freeze(self):
        for v in self.values():
            if isinstance(v, Config):
                v.freeze()
        self.__frozen = True
        return self

    def unfrozen_copy(self):
        out = Config()
        for k, v in self.items():
            out[k] = v.unfrozen_copy() if isinstance(v, Config) else copy.deepcopy(v)
        return out

    def to_dict(self):
        return {
            k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()
        }


def parse_arguments(args):
    """Parse ``--key1.key2=value`` CLI args into a nested Config.

    ``--flag`` means True, ``--flag!`` means False; values go through
    ``yaml.safe_load`` for typing. Mirrors reference utils/options.py:16-34.
    """
    opt_cmd = {}
    for arg in args:
        if not arg.startswith("--"):
            raise ValueError(f"argument must start with '--': {arg!r}")
        if "=" not in arg[2:]:
            key_str, value = (arg[2:-1], "false") if arg.endswith("!") else (arg[2:], "true")
        else:
            key_str, value = arg[2:].split("=", 1)
        keys_sub = key_str.split(".")
        opt_sub = opt_cmd
        for k in keys_sub[:-1]:
            opt_sub = opt_sub.setdefault(k, {})
        if keys_sub[-1] in opt_sub:
            raise ValueError(f"duplicate CLI key: {key_str}")
        opt_sub[keys_sub[-1]] = yaml.safe_load(value)
    return Config(opt_cmd)


def load_options(fname):
    """Load a YAML file, recursively resolving ``_parent_`` bases."""
    with open(fname) as f:
        opt = Config(yaml.safe_load(f))
    if "_parent_" in opt:
        parents = opt.pop("_parent_")
        if isinstance(parents, str):
            parents = [parents]
        base = Config()
        for parent in parents:
            # parent paths are relative to the child file's directory, falling
            # back to cwd (reference resolves from cwd only)
            cand = parent
            if not os.path.isfile(cand):
                cand = os.path.join(os.path.dirname(os.path.abspath(fname)), parent)
            base = override_options(base, load_options(cand))
        opt = override_options(base, opt)
    return opt


def override_options(opt, opt_over, key_stack=(), safe_check=False):
    """Merge ``opt_over`` into ``opt`` (leaf-wise), mirroring the reference.

    With ``safe_check`` (used for CLI overrides), unknown keys raise instead of
    interactively prompting (the reference asks y/n; we fail fast — pass
    ``safe_check=False`` or add the key to the YAML).
    """
    for key, value in opt_over.items():
        if isinstance(value, dict):
            sub = opt.get(key, Config())
            if not isinstance(sub, Config):
                sub = Config()
            opt[key] = override_options(sub, value, key_stack + (key,), safe_check)
        else:
            if safe_check and key not in opt:
                full = ".".join(key_stack + (key,))
                raise KeyError(
                    f"config key {full!r} not found in YAML; "
                    "add it to the options file or pass safe_check=False"
                )
            opt[key] = value
    return opt


def _enable_compilation_cache():
    """Persistent XLA compile cache for every CLI entry point.

    The flagship model's first jit costs 5-15 min through a remote TPU
    backend; with the cache, repeat ``train.py``/``evaluate.py``/``demo.py``
    launches on unchanged code skip it entirely. (The reference has no
    analogous cost: torch eager-executes.) Opt out with
    ``ZEROSHAPE_NO_JAX_CACHE=1``; ``JAX_COMPILATION_CACHE_DIR`` overrides the
    location (default: ``<repo>/.jax_cache``, shared with the multichip
    dryrun's cache). Backends that cannot serialize executables degrade to a
    warning + cache miss, never an error.
    """
    if os.environ.get("ZEROSHAPE_NO_JAX_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # already configured (env var or dryrun_multichip)
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def process_options(opt):
    """Derived fields: seed, run name, output path, H/W."""
    _enable_compilation_cache()
    if opt.get("seed") is None:
        randkey = "".join(random.choice(string.ascii_uppercase) for _ in range(4))
        opt["name"] = f"{opt.get('name', 'run')}_{randkey}"
    opt.setdefault("output_root", "output")
    opt["output_path"] = os.path.join(
        opt["output_root"], opt.get("group", "default"), opt.get("name", "run")
    )
    if "image_size" in opt:
        opt["H"], opt["W"] = opt["image_size"]
    freq = opt.get("freq")
    if freq is not None and freq.get("eval") is None:
        freq["eval"] = max(opt.get("max_epoch", 1) // 20, 1)
    return opt


def set_options(opt_cmd=None, verbose=False, safe_check=True, freeze=True):
    """Build the final config from a CLI-arg Config (must include ``yaml``)."""
    opt_cmd = opt_cmd or Config()
    fname = opt_cmd.get("yaml")
    opt = load_options(fname) if fname else Config()
    cmd = Config({k: v for k, v in opt_cmd.items() if k != "yaml"})
    opt = override_options(opt, cmd, key_stack=(), safe_check=safe_check)
    opt["yaml"] = fname
    process_options(opt)
    if verbose:
        _print_options(opt)
    return opt.freeze() if freeze else opt


def _print_options(opt, level=0):
    for key, value in sorted(opt.items()):
        if isinstance(value, dict):
            print("   " * level + "* " + key + ":")
            _print_options(value, level + 1)
        else:
            print("   " * level + "* " + key + ":", value)


def _diff_options(old, new, path=""):
    """Flat list of 'key: old -> new' lines between two plain dicts."""
    lines = []
    for key in sorted(set(old) | set(new)):
        full = f"{path}.{key}" if path else str(key)
        a, b = old.get(key, "<absent>"), new.get(key, "<absent>")
        if isinstance(a, dict) and isinstance(b, dict):
            lines += _diff_options(a, b, full)
        elif a != b:
            lines.append(f"  {full}: {a!r} -> {b!r}")
    return lines


def save_options_file(opt, path=None, grace_seconds=10):
    """Persist the resolved options to ``<output_path>/options.yaml``.

    If an options.yaml from a previous run exists and differs, print the
    per-key diff and give the user a cancellation window before overwriting
    (reference utils/options.py:110-129 — this guard protects real runs from
    a mistyped --name clobbering another run's config). ``--debug`` or a
    non-interactive stdin skips the wait.
    """
    path = path or os.path.join(opt.output_path, "options.yaml")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    new = opt.to_dict()
    if os.path.isfile(path):
        with open(path) as f:
            old = yaml.safe_load(f) or {}
        diff = _diff_options(old, new)
        if diff:
            print("existing options file found (different from current one):")
            print("\n".join(diff))
            import sys

            interactive = hasattr(sys.stdin, "isatty") and sys.stdin.isatty()
            if not opt.get("debug") and grace_seconds and interactive:
                print(
                    f"please cancel (ctrl-c) within {grace_seconds} seconds "
                    "if you do not want to override..."
                )
                import time

                time.sleep(grace_seconds)
        else:
            print("existing options file found (identical)")
    with open(path, "w") as f:
        yaml.safe_dump(new, f, default_flow_style=False, indent=4)
    return path
