#!/usr/bin/env bash
# Burgers SINODE sweep on one TPU chip — the reference's
# /root/reference/examples-sinode/Burgers/run_a100_512.sh re-targeted:
# 512-point grid, batch 200, dt 1e-3, IMEX tableau sweep vs the
# autodiff-through-solver baseline (--node).
set -e
cd "$(dirname "$0")/../.."

COMMON="--nx 512 --batch_size 200 --batch_time 20 --step_size 1e-3 \
  --epochs 20 --linear_solver hpddm --fixed_jacobian -snes_type ksponly"

for ark in l2 3 4 5; do
  echo "=== ARKIMEX $ark ==="
  python examples/burgers.py $COMMON -ts_arkimex_type "$ark" \
    --train_dir "./train_results_burgers/imex_$ark" "$@"
done

echo "=== autodiff baseline (torchdiffeq analogue) ==="
python examples/burgers.py --nx 512 --batch_size 200 --batch_time 20 \
  --step_size 1e-3 --epochs 20 --node \
  --train_dir ./train_results_burgers/node "$@"
