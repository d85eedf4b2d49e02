#!/bin/bash
# Round-3 sequential TPU evidence runs (single-tenant chip: one at a time).
# Addresses VERDICT r2 items: 3 (real-format data e2e), 4 (Embedding-IN at
# the reference regime), 5 (single-chip scaling anchor), 6 (f32-islands
# seed study), 7 (fast path as default for every pipeline).
#
# Usage: bash scripts/run_suite_r3.sh [stage...]   (default: all stages)
set -x
cd "$(dirname "$0")/.."

run() {
    local dir="$1"; shift
    mkdir -p "$dir"
    timeout 10800 python -m hierarchicalgnn_tpu.run "$@" \
        > "$dir/console.log" 2>&1
    echo "=== $dir exited rc=$? ==="
}

STAGES=("$@")
stage() { [ ${#STAGES[@]} -eq 0 ] || [[ " ${STAGES[*]} " == *" $1 "* ]]; }

# ---------------------------------------------------------------- anchor
# Single-chip scaling anchor: flagship BC step (unsharded + sharded
# graph=1) on the real chip -> benchmarks/scaling_r03.json
if stage anchor; then
    mkdir -p benchmarks
    cp benchmarks/scaling_r02.json benchmarks/scaling_r03.json 2>/dev/null
    timeout 3600 python scripts/measure_single_chip.py \
        --out benchmarks/scaling_r03.json \
        > benchmarks/anchor_console.log 2>&1
    echo "=== anchor exited rc=$? ==="
fi

# ------------------------------------------------------------ seed study
# f32-islands shipping decision (VERDICT r2 weak 5): _r3 variant (shipped,
# f32 embedding heads) vs _r2 variant (bf16 heads, f32 likelihood only),
# 2 extra seeds each at 200 epochs.  Same data seeds; only init differs.
if stage seeds; then
    for seed in 1 2; do
        for variant in r3 r2; do
            extra=()
            [ "$variant" = r2 ] && extra=(--set emb_head_dtype=bfloat16)
            run "runs/bc_seed_${variant}_s${seed}" train --model 4 \
                --run-dir "runs/bc_seed_${variant}_s${seed}" \
                --set init_seed=$seed "${extra[@]}" \
                --set n_nodes_max=1024 --set n_edges_max=2048 \
                --set max_clusters=512 --set max_particles=128 \
                --set train_split='[24,4,4]' --set save_every_n_epochs=20 \
                --max-epochs 200 --log-every-n-steps 0
        done
    done
fi

# ------------------------------------------------------- real-format data
# Reference-format .pt tree -> converter -> CLI training (VERDICT r2
# missing 2): EC-IN and BC, >=5 epochs each from converted .npz files.
if stage realformat; then
    rm -rf /tmp/r3_pt /tmp/r3_npz
    python scripts/make_pt_fixture.py /tmp/r3_pt --events 32 --particles 120
    python scripts/convert_events.py /tmp/r3_pt /tmp/r3_npz
    run runs/realformat_ec train --model 1 \
        --run-dir runs/realformat_ec --input-dir /tmp/r3_npz \
        --set n_nodes_max=1024 --set n_edges_max=4096 \
        --set max_clusters=256 --set max_particles=128 \
        --set train_split='[16,8,8]' --set save_every_n_epochs=5 \
        --max-epochs 8 --log-every-n-steps 0
    run runs/realformat_bc train --model 4 \
        --run-dir runs/realformat_bc --input-dir /tmp/r3_npz \
        --set n_nodes_max=1024 --set n_edges_max=4096 \
        --set max_clusters=512 --set max_particles=128 \
        --set train_split='[16,8,8]' --set save_every_n_epochs=5 \
        --max-epochs 8 --log-every-n-steps 0
fi

# ------------------------------------- fast-path convergence (other pipes)
# The r3 configs ship use_pallas+bf16 for every pipeline; re-run one
# convergence per pipeline at the new defaults (VERDICT r2 weak 8).
if stage fastpath; then
    run runs/ec_fast_r3 train --model 1 \
        --run-dir runs/ec_fast_r3 \
        --set n_nodes_max=1024 --set n_edges_max=4096 \
        --set max_clusters=256 --set max_particles=128 \
        --set train_split='[24,4,4]' --set save_every_n_epochs=5 \
        --max-epochs 15 --log-every-n-steps 0
    run runs/emb_hgnn_fast_r3 train --model 3 \
        --run-dir runs/emb_hgnn_fast_r3 \
        --set n_nodes_max=1024 --set n_edges_max=2048 \
        --set max_clusters=512 --set max_particles=128 \
        --set train_split='[24,4,4]' --set save_every_n_epochs=10 \
        --max-epochs 40 --log-every-n-steps 0
    run runs/gmrt_fast_r3 transfer --model 5 \
        --run-dir runs/gmrt_fast_r3 --source-run runs/bc_seed_r3_s1 \
        --set n_nodes_max=1024 --set n_edges_max=2048 \
        --set max_clusters=512 --set max_particles=128 \
        --set train_split='[24,4,4]' --set save_every_n_epochs=10 \
        --max-epochs 30 --log-every-n-steps 0
fi

# -------------------------------------- Embedding-IN at reference regime
# 200 epochs, 300-event train split (the r2 run overfit 24 events:
# train loss -> 0.006 while val rose; VERDICT r2 missing 4).
if stage embedding; then
    run runs/embedding_in_r3 train --model 2 \
        --run-dir runs/embedding_in_r3 \
        --set n_nodes_max=1024 --set n_edges_max=4096 \
        --set max_clusters=256 --set max_particles=128 \
        --set save_every_n_epochs=20 \
        --max-epochs 200 --log-every-n-steps 0
fi

echo "SUITE R3 DONE"
