#!/bin/bash
# Sequential convergence-evidence runs (single-tenant TPU: one at a time).
# Usage: bash scripts/run_convergence_suite.sh
set -x
cd "$(dirname "$0")/.."

# gMRT transfer-learned from the trained BC checkpoint (reference
# Notebooks/script.py update()/switch() flow)
timeout 3600 python -m hierarchicalgnn_tpu.run transfer --model 5 \
    --run-dir runs/gMRT_convergence_r2 --source-run runs/bc_convergence_r3 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
    --max-epochs 30 --log-every-n-steps 24

# Embedding-HGNN-GMM (model 3)
timeout 3600 python -m hierarchicalgnn_tpu.run train --model 3 \
    --run-dir runs/Embedding-HGNN-GMM_convergence_r2 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
    --max-epochs 40 --log-every-n-steps 24

# Embedding-IN (model 2), longer than the old 15-epoch run
timeout 3600 python -m hierarchicalgnn_tpu.run train --model 2 \
    --run-dir runs/Embedding-IN_convergence_r2 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
    --max-epochs 100 --log-every-n-steps 24

echo "SUITE DONE"
