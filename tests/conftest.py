"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU so they are hermetic and can exercise the
multi-device sharding paths (`jax.sharding.Mesh` over 8 virtual devices)
without TPU hardware, mirroring the reference's CPU-runnable small config
(BASELINE.json config 1).
"""

import os
import sys

# Force-set (not setdefault): the environment's TPU plugin sitecustomize
# rewrites JAX_PLATFORMS at interpreter start, before conftest runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()

# The fast tier is XLA-compile-bound (one ~15-25 s CPU compile per big
# loss/step graph); dialing back backend optimization cuts compile ~35%
# while keeping semantics (tolerance-checked equivalence tests still
# pass). The slow tier is run-time-bound (multi-minute optimization
# loops), so there the optimized code pays for itself — apply the diet
# unless the CLI markexpr actually SELECTS slow tests (`-m slow`;
# `-m "not slow"` keeps the diet on).


def _selects_slow_tests(argv):
    markexpr = ""
    for index, arg in enumerate(argv):
        if arg == "-m" and index + 1 < len(argv):
            markexpr = argv[index + 1]
        elif arg.startswith("-m="):
            markexpr = arg[3:]
    return "slow" in markexpr and "not slow" not in markexpr


if not _selects_slow_tests(sys.argv) and (
    "xla_backend_optimization_level" not in flags
):
    flags += (
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# Belt and suspenders: the env var alone loses to an eagerly-registered
# TPU plugin; the config flag wins as long as no backend is live yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-bound (every test
# jits fresh graphs); re-runs hit the cache instead of recompiling.
# Exported as env vars (not just jax.config) so the tool-CLI
# subprocesses the e2e tests spawn share the same cache — repeated tool
# invocations then compile once even on a cold run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vsrd_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
)
