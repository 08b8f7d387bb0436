#!/usr/bin/env bash
# KS SINODE sweep on one TPU chip — the reference's A100 batch script
# (/root/reference/examples-sinode/KS/runs64_a100.sh) re-targeted: 64-point
# grid, batch 256, dt 0.2, sweeping the ARK IMEX tableau {l2, 3, 4, 5} plus
# the CN and explicit baselines. Results under train_results_ks/.
set -e
cd "$(dirname "$0")/../.."

COMMON="--pnode_model imex --linear_solver hpddm --fixed_jacobian \
  --use_pallas --batch_size 256 --step_size 0.2 --max_epochs 200 \
  -snes_type ksponly"

for ark in l2 3 4 5; do
  echo "=== ARKIMEX $ark ==="
  python examples/ks.py $COMMON -ts_arkimex_type "$ark" \
    --train_dir "./train_results_ks/imex_$ark" "$@"
done

echo "=== CN (snode) ==="
python examples/ks.py --pnode_model snode --pnode_method cn --implicit_form \
  --batch_size 256 --step_size 0.2 --max_epochs 200 \
  --train_dir ./train_results_ks/cn_snode "$@"

echo "=== explicit rk4 (fine dt) ==="
python examples/ks.py --pnode_model snode --pnode_method rk4 \
  --batch_size 256 --step_size 0.001 --time_window_size 1 --max_epochs 200 \
  --train_dir ./train_results_ks/rk4 "$@"
