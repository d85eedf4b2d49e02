#!/bin/bash
# Round-2 sequential convergence-evidence runs (single-tenant TPU: one at
# a time).  Each run gets a generous timeout and its own console log; the
# CLI now enables the persistent compile cache (run.py), which is what
# starved the round-1 attempts (~17 min remote compile per program,
# repeated for every invocation).
#
# Usage: bash scripts/run_convergence_suite_r2.sh
set -x
cd "$(dirname "$0")/.."

run() {
    local dir="$1"; shift
    mkdir -p "$dir"
    timeout 10800 python -m hierarchicalgnn_tpu.run "$@" \
        > "$dir/console.log" 2>&1
    echo "=== $dir exited rc=$? ==="
}

# 1) gMRT transfer-learned from the trained BC checkpoint (reference
#    Notebooks/script.py update()/switch() flow).  Round-1 attempt died at
#    the first validation epoch.
run runs/gMRT_convergence_r2 transfer --model 5 \
    --run-dir runs/gMRT_convergence_r2 --source-run runs/bc_convergence_r3 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
    --max-epochs 30 --log-every-n-steps 24

# 2) Embedding-HGNN-GMM (model 3).  Round-1 attempt produced 0 metric lines.
run runs/Embedding-HGNN-GMM_convergence_r2 train --model 3 \
    --run-dir runs/Embedding-HGNN-GMM_convergence_r2 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
    --max-epochs 40 --log-every-n-steps 24

# 3) BC flagship at the fast operating point: Pallas kernels + bf16 compute
#    + tight padding (events are ~900 nodes / ~1400 edges at 120 particles).
#    Ties the headline performance path to the headline quality evidence.
run runs/bc_pallas_bf16 train --model 4 \
    --run-dir runs/bc_pallas_bf16 \
    --set use_pallas=true --set compute_dtype=bfloat16 \
    --set n_nodes_max=1024 --set n_edges_max=2048 \
    --set max_clusters=512 --set max_particles=128 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
    --max-epochs 60 --log-every-n-steps 24

# 4) Embedding-IN (model 2), long run (round 1 stopped at 15 epochs;
#    the reference trains 200).
run runs/Embedding-IN_convergence_r2 train --model 2 \
    --run-dir runs/Embedding-IN_convergence_r2 \
    --set train_split='[24,4,4]' --set save_every_n_epochs=10 \
    --max-epochs 120 --log-every-n-steps 24

echo "SUITE DONE"
