import os

# Force a deterministic 8-device CPU mesh for all tests: the standard JAX
# recipe for testing a v5e-8 mesh without hardware. The ambient environment
# may pin an experimental TPU platform programmatically (sitecustomize), so we
# override via jax.config, not just env vars, before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU's in-process collectives CHECK-abort ("AwaitAndLogIfStuck" ->
# InProcessCommunicator::AllReduce) when the 8-way rendezvous is starved on a
# small host: a participant waiting in the rendezvous can hold the only Eigen
# pool thread, so on 1-2 core machines the default terminate timeout
# nondeterministically kills the process (SIGABRT mid-suite). Raise both
# collective timeouts so starved rendezvous complete instead of aborting.
if "xla_cpu_collective" not in flags:
    flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Keep the suite hermetic: the CLIs enable the persistent compile cache
# (config._enable_compilation_cache), but cache entries AOT-compiled on a
# machine with different CPU features can SIGILL when loaded, and this
# 1-core host is flaky enough already. CLI cache behavior is covered by
# subprocess tests in test_config.py.
os.environ.setdefault("ZEROSHAPE_NO_JAX_CACHE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
