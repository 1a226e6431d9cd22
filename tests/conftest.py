"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the TPU answer to testing
multi-chip sharding without a pod — SURVEY.md §4): the host platform is
forced to CPU with 8 virtual devices. The real-TPU path is exercised by
bench.py and __graft_entry__.py. Set GRU4REC_TPU_TEST_PLATFORM=tpu to run
the suite on the actual accelerator instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("GRU4REC_TPU_TEST_PLATFORM", "cpu") == "cpu":
    # The axon/TPU plugin registers itself in sitecustomize before pytest
    # starts; overriding the platform here still works because no backend
    # has been initialized yet.
    jax.config.update("jax_platforms", "cpu")
