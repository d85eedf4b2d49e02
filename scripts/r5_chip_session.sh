#!/bin/bash
# Round-5 chip measurement session (single-tenant: run only after the
# realformat queue has fully drained).
set -x
cd /root/repo
mkdir -p benchmarks

timeout 1800 python scripts/export_fused_repro.py \
  > benchmarks/export_repro_r05.log 2>&1
echo "repro rc=$?"

timeout 2400 python scripts/profile_phases.py --dtype bfloat16 --warmup 40 \
  > benchmarks/phases_r05.log 2>&1
echo "phases rc=$?"

timeout 3000 python scripts/measure_single_chip.py \
  --out benchmarks/scaling_r05.json > benchmarks/anchor_r05.log 2>&1
echo "anchor rc=$?"

timeout 3600 python scripts/bench_grid_knn.py \
  --out benchmarks/grid_knn_r05.json > benchmarks/grid_knn_r05.log 2>&1
echo "gridknn rc=$?"

timeout 900 python bench.py > benchmarks/bench_r05.log 2>&1
echo "bench rc=$?"
