"""GRAND hyperparameter sweep — the offline ray-tune equivalent.

The reference drives GRAND HPO with ray-tune
(/root/reference/examples-sinode/grand/src/ray_tune.py: ``tune.run`` with an
``AsyncHyperBandScheduler`` pruning trials on validation accuracy),
aggregating results through the locking CSV Recorder. Without a cluster,
this script runs the same search in-process, one trial per configuration,
appending every trial to the same Recorder CSV:

- ``--scheduler random`` — plain random search, every trial gets the full
  epoch budget;
- ``--scheduler asha`` (default) — successive halving with reduction factor
  ``--eta``: all sampled configs run at the first rung
  (``--min_epochs``), the top 1/eta by validation accuracy are promoted to
  an eta-times larger budget, and so on until the full ``--epochs``
  budget — the single-worker synchronous form of the reference's
  AsyncHyperBand pruning.

    python examples/grand_sweep.py --trials 8 --epochs 40
"""

from __future__ import annotations

import argparse
import math
import os
import subprocess
import sys
import time

import numpy as np

parser = argparse.ArgumentParser("grand-sweep")
parser.add_argument("--trials", type=int, default=6)
parser.add_argument("--epochs", type=int, default=60)
parser.add_argument("--scheduler", type=str, default="asha",
                    choices=["random", "asha"])
parser.add_argument("--eta", type=int, default=2,
                    help="ASHA reduction factor (promote top 1/eta per rung)")
parser.add_argument("--min_epochs", type=int, default=0,
                    help="first-rung budget (default: epochs // eta^rungs)")
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


def run_trial(cfg, epochs, tag):
    cmd = [
        sys.executable, "examples/grand_node.py",
        "--function", str(cfg["function"]),
        "--time", str(cfg["time"]),
        "--hidden_dim", str(cfg["hidden_dim"]),
        "--lr", str(cfg["lr"]),
        "--epochs", str(epochs),
        "--train_dir", args.train_dir,
    ] + (["--cpu"] if args.cpu else []) + unknown
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True)
    best_val, line = -1.0, None
    for ln in out.stdout.splitlines():
        if ln.startswith("best val"):
            line = ln
            try:
                best_val = float(ln.split("|")[0].split()[-1])
            except ValueError:
                pass
    print(f"{tag}: {cfg} @ {epochs}ep -> {line} ({time.time()-t0:.1f}s)")
    return best_val, line


def main():
    if args.trials < 1:
        raise SystemExit("--trials must be >= 1")
    rng = np.random.default_rng(args.seed)
    if args.scheduler == "random":
        for trial in range(args.trials):
            run_trial(sample_config(rng), args.epochs, f"trial {trial}")
        print(f"\nsweep CSV: {os.path.join(args.train_dir, 'results.csv')}")
        return

    # -- ASHA / successive halving -------------------------------------------
    eta = max(2, args.eta)
    n_rungs = max(1, int(math.floor(math.log(args.trials, eta))) + 1)
    min_ep = args.min_epochs or max(1, args.epochs // eta ** (n_rungs - 1))
    rungs = [min(args.epochs, min_ep * eta ** k) for k in range(n_rungs)]
    # dedupe saturated rungs (tiny --epochs)
    rungs = sorted(set(rungs))
    print(f"ASHA rungs (epochs): {rungs}, eta={eta}")

    population = [sample_config(rng) for _ in range(args.trials)]
    for k, budget in enumerate(rungs):
        scored = []
        for i, cfg in enumerate(population):
            val, _ = run_trial(cfg, budget, f"rung {k} trial {i}")
            scored.append((val, i, cfg))
        if all(v < 0 for v, _, _ in scored):
            raise SystemExit(
                f"rung {k}: every trial failed to report a validation "
                "accuracy — aborting instead of promoting failed configs"
            )
        if k == len(rungs) - 1:
            break
        scored.sort(reverse=True)
        keep = max(1, math.ceil(len(scored) / eta))
        population = [cfg for _, _, cfg in scored[:keep]]
        print(f"rung {k}: promoted {keep}/{len(scored)} configs")
    best = max(scored)
    print(f"\nbest config: {best[2]} (val {best[0]:.4f})")
    print(f"sweep CSV: {os.path.join(args.train_dir, 'results.csv')}")


if __name__ == "__main__":
    main()
