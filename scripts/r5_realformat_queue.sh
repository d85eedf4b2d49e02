#!/bin/bash
# Round-5 file-based convergence queue (VERDICT r4 ask 3).
# Sequential: the chip is single-tenant; each run.py holds the device lock.
# Regimes mirror the converged in-memory runs:
#   Embedding-IN      : 300-event regime of runs/embedding_in_r3
#   Embedding-HGNN-GMM: 100-event regime of runs/emb_hgnn_long_r4
#   BC (gMRT source)  : 300-event regime of runs/realformat_bc_full
#   gMRT transfer     : 24-event default-padding regime of runs/gmrt_ctrl_fast_goodsrc
set -x
cd /root/repo
PT=/tmp/r5data/pt320
NPZ=/tmp/r5data/npz320

timeout 4500 python -m hierarchicalgnn_tpu.run train --model 2 \
  --input-dir "$PT" --run-dir runs/realformat_emb_in --max-epochs 60 \
  --log-every-n-steps 300 \
  --set n_nodes_max=1024 --set n_edges_max=2048 \
  > runs/realformat_emb_in.launch.log 2>&1
echo "emb_in rc=$?"

timeout 4500 python -m hierarchicalgnn_tpu.run train --model 3 \
  --input-dir "$NPZ" --run-dir runs/realformat_emb_hgnn --max-epochs 80 \
  --log-every-n-steps 100 \
  --set 'train_split=[100,10,10]' --set n_nodes_max=1024 \
  --set n_edges_max=2048 --set max_clusters=512 \
  > runs/realformat_emb_hgnn.launch.log 2>&1
echo "emb_hgnn rc=$?"

timeout 7200 python -m hierarchicalgnn_tpu.run train --model 4 \
  --input-dir "$PT" --run-dir runs/realformat_bc_src --max-epochs 200 \
  --log-every-n-steps 300 \
  --set n_nodes_max=1024 --set n_edges_max=2048 --set max_clusters=512 \
  > runs/realformat_bc_src.launch.log 2>&1
echo "bc_src rc=$?"

timeout 3600 python -m hierarchicalgnn_tpu.run transfer --model 5 \
  --input-dir "$PT" --run-dir runs/realformat_gmrt \
  --source-run runs/realformat_bc_src --max-epochs 40 \
  --log-every-n-steps 24 \
  --set 'train_split=[24,8,8]' \
  > runs/realformat_gmrt.launch.log 2>&1
echo "gmrt rc=$?"
