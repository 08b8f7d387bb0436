"""Test fixture: CPU backend, fp64, 8 virtual devices for sharding tests.

The reference's CI runs the real petsc4py stack CPU-only in fp64
(/root/reference/.github/workflows/build.sh real-scalar double build;
SURVEY.md section 4). Here the analogue is the JAX CPU backend with x64
enabled, plus ``xla_force_host_platform_device_count=8`` so multi-chip
sharding paths compile and execute on a virtual 8-device mesh without TPU
hardware.
"""

import os

# The sandbox exports JAX_PLATFORMS=axon (a tunneled TPU backend); tests must
# run on the local CPU backend — override via env AND jax.config (the config
# update is what reliably wins over the plugin's env injection).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

import pnode_tpu  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_options():
    """Each test starts from an empty options database."""
    pnode_tpu.clear_options()
    yield
    pnode_tpu.clear_options()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full-suite mode; CI uses this)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
