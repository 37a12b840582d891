"""Model stack (L2) — DPT depth, coordinate/RGB encoders, implicit decoder.

Also hosts the compute-dtype policy shared by every entry point (train /
evaluate / demo / bench): the reference ships AMP as a training option
(reference model/shape_engine.py:135-136,252-268, options/shape.yaml
optim.amp); on TPU that becomes bf16 module compute with fp32 params and
optimizer state (no GradScaler — bf16 keeps fp32's exponent range).
"""

import jax.numpy as jnp


def resolve_compute_dtype(opt):
    """Map ``opt.arch.dtype`` to the model compute dtype.

    ``auto`` (the shipped default): bfloat16 on TPU backends (including the
    experimental ``axon`` PJRT tunnel), float32 everywhere else — so
    ``python train.py`` / ``evaluate.py`` / ``demo.py`` on a chip run the
    same bf16 compute the benchmarks measure, while CPU test runs stay
    exactly reproducible in fp32. Any explicit dtype name ("float32",
    "bfloat16", ...) is honored verbatim. Params, optimizer state, and
    geometry/eval math stay fp32 regardless (see CLAUDE.md conventions).
    """
    name = (opt.get("arch") or {}).get("dtype") or "auto"
    if name == "auto":
        import jax

        platform = jax.devices()[0].platform
        return jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    return jnp.dtype(name)
