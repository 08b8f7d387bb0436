"""Standalone driver-entry checks (VERDICT r1, next-round item #1).

These run ``__graft_entry__`` in a FRESH subprocess with the sandbox's real
environment (``JAX_PLATFORMS=axon`` pointing at the tunneled TPU) — i.e.
exactly how the round driver invokes it — so they catch backend-inheritance
bugs the in-process test suite (whose conftest already forces CPU) cannot.
Reference behavior being validated: the multi-chip DP training step
(SURVEY.md §2.3 / §5.8) compiles and executes on an n-device mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Reproduce the driver's process env: axon platform, no CPU forcing."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    # keep the axon plugin importable, as in the sandbox default
    pythonpath = env.get("PYTHONPATH", "")
    if "/root/.axon_site" not in pythonpath and os.path.isdir(
        "/root/.axon_site"
    ):
        env["PYTHONPATH"] = (
            f"{pythonpath}:/root/.axon_site" if pythonpath else "/root/.axon_site"
        )
    return env


@pytest.mark.slow
def test_dryrun_multichip_as_driver_invokes_it():
    """dryrun_multichip(8) must self-force a virtual CPU mesh and pass."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_dryrun_forces_cpu_mesh_without_subprocess():
    """In-process variant (conftest already on CPU): exercises the same path
    cheaply — make_mesh must build from explicit CPU devices and Pallas must
    be gated off for a CPU mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)
