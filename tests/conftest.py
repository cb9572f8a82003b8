"""Test configuration: CPU backend with 8 virtual devices + float64.

Tests run on CPU so that (a) multi-chip sharding is exercised on a virtual
8-device mesh without TPU hardware and (b) float64 verification against
closed forms / finite differences is available (the reference is float64
end-to-end; TPU production runs are float32 — see SURVEY.md §2.10).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may pin the TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the axon TPU plugin registers itself
# regardless of JAX_PLATFORMS, so pin the platform through the config too
# (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache shared across test runs and xdist workers —
# the big scan/Pallas-interpret graphs dominate suite wall-clock otherwise.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
