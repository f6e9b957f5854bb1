import os

# Simulate an 8-device mesh on CPU for sharding tests (SURVEY.md §4d) and
# keep unit tests off the (single, exclusively-locked) TPU tunnel.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's axon sitecustomize force-sets jax_platforms="axon,cpu"
# programmatically, which overrides the JAX_PLATFORMS env var — so select
# the CPU backend through the config API before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process tests")
