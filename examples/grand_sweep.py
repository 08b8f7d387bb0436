"""GRAND hyperparameter sweep — the offline ray-tune equivalent.

The reference drives GRAND HPO with ray-tune
(/root/reference/examples-sinode/grand/src/ray_tune.py) aggregating results
through the locking CSV Recorder. Without a cluster, this script runs a
random/grid search in-process, one trial per configuration, appending every
trial to the same Recorder CSV::

    python examples/grand_sweep.py --trials 8 --epochs 40
"""

from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys
import time

import numpy as np

parser = argparse.ArgumentParser("grand-sweep")
parser.add_argument("--trials", type=int, default=6)
parser.add_argument("--epochs", type=int, default=60)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--train_dir", type=str, default="./train_results_grand")
parser.add_argument("--cpu", action="store_true")
args, unknown = parser.parse_known_args()

SPACE = {
    "function": ["laplacian", "transformer"],
    "time": [1.0, 2.0, 3.0],
    "hidden_dim": [32, 64],
    "lr": [0.01, 0.005],
}


def sample_config(rng):
    return {k: v[rng.integers(0, len(v))] for k, v in SPACE.items()}


def main():
    rng = np.random.default_rng(args.seed)
    results = []
    for trial in range(args.trials):
        cfg = sample_config(rng)
        cmd = [
            sys.executable, "examples/grand_node.py",
            "--function", str(cfg["function"]),
            "--time", str(cfg["time"]),
            "--hidden_dim", str(cfg["hidden_dim"]),
            "--lr", str(cfg["lr"]),
            "--epochs", str(args.epochs),
            "--train_dir", args.train_dir,
        ] + (["--cpu"] if args.cpu else []) + unknown
        t0 = time.time()
        out = subprocess.run(cmd, capture_output=True, text=True)
        best = None
        for line in out.stdout.splitlines():
            if line.startswith("best val"):
                best = line
        print(f"trial {trial}: {cfg} -> {best} ({time.time()-t0:.1f}s)")
        results.append((cfg, best))
    print(f"\nsweep CSV: {os.path.join(args.train_dir, 'results.csv')}")


if __name__ == "__main__":
    main()
