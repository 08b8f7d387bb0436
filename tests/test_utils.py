"""Utils: meters, Tee, recorder, metrics, debug dumps, options prefixes."""

import json
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

import pnode_tpu
from pnode_tpu.adjoint import SolveStats
from pnode_tpu.utils import (
    MetricsWriter,
    Recorder,
    RunningAverageMeter,
    SolverDivergedError,
    Tee,
    assert_converged,
    device_memory_gb,
    dump_state,
    nan_guard,
)


def test_running_average_meter():
    m = RunningAverageMeter(momentum=0.5)
    m.update(2.0)
    assert m.avg == 2.0
    m.update(4.0)
    assert m.avg == pytest.approx(3.0)


def test_tee_duplicates_stdout(tmp_path, capsys):
    import sys

    f = tmp_path / "log.txt"
    tee = Tee(str(f))
    sys.stdout = tee
    try:
        print("hello-tee")
    finally:
        tee.close()
    assert "hello-tee" in f.read_text()


def test_recorder_csv_roundtrip(tmp_path):
    rec = Recorder()
    rec.record(a=1, b="x")
    rec.next_record()
    rec.record(a=2, c=3.5)
    path = tmp_path / "res.csv"
    rec.save(str(path))
    text = path.read_text()
    assert "a" in text and "x" in text and "3.5" in text


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.add_scalar("Train/Loss", 0.5, 1)
    w.add_scalar("Train/Loss", 0.25, 2)
    w.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(x) for x in lines]
    assert recs[1]["value"] == 0.25 and recs[1]["step"] == 2


def test_nan_guard():
    assert nan_guard(jnp.asarray(1.5)) == 1.5
    with pytest.raises(FloatingPointError):
        nan_guard(jnp.asarray(float("nan")))


def test_assert_converged_dumps(tmp_path):
    stats = SolveStats(
        newton_iters=jnp.asarray(50), newton_converged=jnp.asarray(False)
    )
    pnode_tpu.init(["p", "-pnode_dump_on_failure",
                    str(tmp_path / "fail")])
    with pytest.raises(SolverDivergedError, match="dumped"):
        assert_converged(stats, "test", dump={"y": jnp.ones(3)})
    dumps = list(tmp_path.glob("fail_*.npz"))
    assert len(dumps) == 1
    assert np.allclose(np.load(dumps[0])["y"], 1.0)


def test_assert_converged_passes():
    stats = SolveStats(
        newton_iters=jnp.asarray(3), newton_converged=jnp.asarray(True)
    )
    assert_converged(stats)


def test_device_memory_stats_shape():
    out = device_memory_gb()
    assert set(out) == {"peak_gb", "live_gb"}


def test_solver_prefix_scoped_options():
    """Per-solver option prefixes: two solvers, different -ts_type."""
    from pnode_tpu import Func, ODESolver

    pnode_tpu.init(["p", "-inner_ts_type", "cn", "-ts_type", "rk",
                    "-ts_rk_type", "4"])
    f = Func(lambda t, y, p: -y, {})
    outer = ODESolver()
    outer.setupTS(jnp.zeros(2), f, step_size=0.1, method="dopri5")
    inner = ODESolver(prefix="inner_")
    inner.setupTS(jnp.zeros(2), f, step_size=0.1, method="dopri5",
                  implicit_form=True)
    assert outer.method == "4"
    assert inner.method == "cn"


def test_windowed_loader_native_and_fallback():
    from pnode_tpu.data import WindowedLoader, native_available

    u = np.arange(60, dtype=np.float32).reshape(30, 2)
    for use_native in ([True, False] if native_available() else [False]):
        ld = WindowedLoader(u, window=3, batch=5, seed=0,
                            use_native=use_native)
        n = 0
        for y0, tgt in ld:
            assert y0.shape == (5, 2) and tgt.shape == (5, 3, 2)
            for s in range(5):
                i = int(y0[s, 0] // 2)
                np.testing.assert_allclose(tgt[s, 0], u[i + 1])
                np.testing.assert_allclose(tgt[s, 2], u[i + 3])
            n += 1
        assert n == ld.batches_per_epoch


def test_ks_generator_long_trajectories_finite():
    """The L=22 Galerkin truncation blows up near t~370; the chunked
    generator must stay finite for long datasets (regression for the NaN
    validation data seen in training)."""
    from pnode_tpu.data import generate_ks_data

    u, dt = generate_ks_data(nx=64, n_samples=2500, dt_data=0.2, seed=3)
    assert u.shape == (2500, 64)
    assert np.isfinite(u).all()
    assert 0.5 < u.std() < 5.0  # on the attractor, not collapsed/exploded


def test_checkpoint_backends_roundtrip(tmp_path):
    """pickle and orbax checkpoint backends round-trip pytrees + metadata
    (-pnode_checkpoint_format; reference protocol = torch.save dicts)."""
    import jax.numpy as jnp
    import numpy as np

    from pnode_tpu.utils import load_checkpoint, save_checkpoint

    payload = {
        "epoch": 7,
        "best": 0.125,
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)},
    }
    p1 = str(tmp_path / "ck.pkl")
    save_checkpoint(p1, payload, format="pickle")
    r1 = load_checkpoint(p1)
    assert r1["epoch"] == 7
    np.testing.assert_allclose(r1["params"]["w"], payload["params"]["w"])

    p2 = str(tmp_path / "ck_orbax")
    save_checkpoint(p2, payload, format="orbax")
    r2 = load_checkpoint(p2)
    np.testing.assert_allclose(np.asarray(r2["params"]["b"]), 1.0)
    np.testing.assert_allclose(r2["params"]["w"], np.asarray(payload["params"]["w"]))
    # overwrite semantics match pickle's
    save_checkpoint(p2, {**payload, "epoch": 8}, format="orbax")
    assert int(load_checkpoint(p2)["epoch"]) == 8
