#!/bin/bash
# Round-4 sequential TPU evidence runs (single-tenant chip: one at a time).
# Addresses VERDICT r3 items: 1 (flagship sharded anchor + phase breakdown),
# 2 (SDDMM kernel bench), 4 (fused-step SIGSEGV bisect), 7 (gMRT controlled
# comparison), 8 (bf16 SpMM bound probe).
#
# Usage: bash scripts/run_suite_r4.sh [stage...]   (default: all stages)
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

# --------------------------------------------------------------- anchor
# Flagship-shape 1-chip anchor: unsharded vs sharded(graph=1) + phase
# breakdown -> benchmarks/scaling_r04.json
if stage anchor; then
    mkdir -p benchmarks
    cp benchmarks/scaling_r03.json benchmarks/scaling_r04.json 2>/dev/null
    timeout 3600 python scripts/profile_sharded.py \
        --out benchmarks/scaling_r04.json \
        > benchmarks/anchor_r04_console.log 2>&1
    echo "=== anchor exited rc=$? ==="
fi

# --------------------------------------------------------------- probes
if stage probes; then
    timeout 3600 python scripts/probe_spmm_bf16.py \
        > benchmarks/probe_spmm_bf16_r04.json 2> benchmarks/probe_spmm_bf16_r04.log
    echo "=== spmm probe exited rc=$? ==="
fi

# --------------------------------------------------------------- bisect
# Embedding-HGNN-GMM fused-step compiler SIGSEGV minimization
if stage bisect; then
    timeout 3600 python scripts/bisect_fused_crash.py \
        > benchmarks/bisect_fused_r04.json 2> benchmarks/bisect_fused_r04.log
    echo "=== bisect exited rc=$? ==="
fi

# ---------------------------------------------------------------- bench
if stage bench; then
    timeout 1200 python bench.py > benchmarks/bench_r04_console.log 2>&1
    echo "=== bench exited rc=$? ==="
fi

# ----------------------------------------------------------------- gmrt
# Controlled fast-point comparison (VERDICT r3 item 7): same BC source
# checkpoint, same 30-epoch budget, same init seed; only the operating
# point differs (shipped Pallas+bf16 vs f32/XLA).
if stage gmrt; then
    for variant in fast f32; do
        extra=()
        [ "$variant" = f32 ] && extra=(--set use_pallas=false \
                                       --set compute_dtype=null)
        run "runs/gmrt_ctrl_${variant}" transfer --model 5 \
            --run-dir "runs/gmrt_ctrl_${variant}" \
            --source-run runs/bc_seed_r3_s1 \
            --set init_seed=0 "${extra[@]}" \
            --set n_nodes_max=1024 --set n_edges_max=2048 \
            --set max_clusters=512 --set max_particles=128 \
            --set "train_split=[24,4,4]" --set save_every_n_epochs=10 \
            --max-epochs 30 --log-every-n-steps 0
    done
fi

echo "SUITE R4 DONE"
