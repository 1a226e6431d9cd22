"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the TPU answer to testing
multi-chip sharding without a pod — SURVEY.md §4): the host platform is
forced to CPU with 8 virtual devices. The real-TPU path is exercised by
bench.py and __graft_entry__.py. Set GRU4REC_TPU_TEST_PLATFORM=tpu to run
the suite on the actual accelerator instead.
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: most of the suite's wall time is XLA compiles
# of small jitted programs that rarely change. The cache cuts repeat runs
# ~3x, and — set via the environment here — is inherited by the CLI/paropt
# subprocess tests, whose children compile the same programs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "gru4rec_tpu_jax_cache"),
)

# The NaN-abort diagnostic dump defaults to ./gru4rec_nan_dump.npz; the
# deliberately-diverging tests would litter the repo root with it. Tests
# that assert the dump use checkpoint_path (which overrides this).
os.environ.setdefault("GRU4REC_TPU_NAN_DUMP", "")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if os.environ.get("GRU4REC_TPU_TEST_PLATFORM", "cpu") == "cpu":
    # The axon/TPU plugin registers itself in sitecustomize before pytest
    # starts; overriding the platform here still works because no backend
    # has been initialized yet.
    jax.config.update("jax_platforms", "cpu")
