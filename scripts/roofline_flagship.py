"""MFU / roofline account of the flagship BC-HGNN-GMM train step.

VERDICT r4 ask 7: decompose the measured flagship step into (a) MXU-bound
MLP time vs the v5e peak, (b) kernel/memory-bound aggregation+gather time
vs the measured sorted-native kernel rate, (c) the kNN and replicated
remainder, and state the achievable floor -- i.e. whether another 1.5x
exists in the step or it is done.

Pure host-side arithmetic: analytic GEMM FLOP and edge-traversal counts
from the model shapes (models/{blocks,cells,mlp}.py), combined with
MEASURED inputs (the 1-chip anchor step time, the bench kernel rates, and
the phase probes).  No device is touched, so it is safe to run any time:

    python scripts/roofline_flagship.py \
        --step-ms 373.5 --agg-rate-bf16 649e6 --knn-ms 10.5 \
        --replicated-ms 8.0 --out benchmarks/roofline_r05.json

v5e peaks (public): 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
"""

import argparse
import json
import os

PEAK_BF16 = 197e12
PEAK_HBM = 819e9

# flagship shape (matches scripts/measure_single_chip.py /
# collective_audit.py): reference BC architecture at TrackML scale
N = 24576            # padded hits
E_IN = 49152         # undirected input-edge capacity
C = 3072             # max_clusters
L = 256              # latent
H = 512              # hidden (ratio 2)
K_BIP = 5            # bipartitegraph_sparsity
K_SUP = 10           # supergraph_sparsity
ITERS_IN = 6
ITERS_HGNN = 6

E = 2 * E_IN         # directed (bidirectionalized)
E_BIP = N * K_BIP
E_SUP = 2 * C * K_SUP


def mlp_flops(rows, d_in, hidden, d_out, hidden_layers):
    """Forward GEMM FLOPs of models/mlp.MLP (hidden_layers hidden + out)."""
    dims = [d_in] + [hidden] * hidden_layers + [d_out]
    return 2 * rows * sum(a * b for a, b in zip(dims[:-1], dims[1:]))


def forward_mlp_flops():
    f = {}
    # encoders (InteractionGNNBlock)
    f["encoders"] = (mlp_flops(N, 3, H, L, 3) + mlp_flops(E, 6, H, L, 2))
    # interaction cells: node [N, 2L], edge [E, 3L]
    f["in_cells"] = ITERS_IN * (
        mlp_flops(N, 2 * L, H, L, 3) + mlp_flops(E, 3 * L, H, L, 2))
    # intermediate embedding head [N, L -> 8]
    f["emb_head"] = mlp_flops(N, L, H, 8, 3)
    # supernode/superedge encoders
    f["super_encoders"] = (mlp_flops(C, L, H, L - 8, 3)
                           + mlp_flops(E_SUP, 2 * L, H, L, 2))
    # hierarchical cells: node [N, 3L], edge [E, 3L], supernode [C, 3L],
    # superedge [E_SUP, 3L]
    f["hgnn_cells"] = ITERS_HGNN * (
        mlp_flops(N, 3 * L, H, L, 3) + mlp_flops(E, 3 * L, H, L, 2)
        + mlp_flops(C, 3 * L, H, L, 3) + mlp_flops(E_SUP, 3 * L, H, L, 2))
    # bipartite score head [E_BIP, 2L -> 1]
    f["score_head"] = mlp_flops(E_BIP, 2 * L, H, 1, 3)
    return f


def mlp_act_bytes(rows, d_in, hidden, d_out, hidden_layers, passes=4.0):
    """Estimated HBM activation traffic of one MLP call (bf16): each layer
    output is written then read by the next layer (+ layernorm pass), and
    the backward re-reads saved activations and writes activation grads
    (remat off on the bf16 path) -- ``passes`` ~ 4 streams per tensor."""
    dims = [d_in] + [hidden] * hidden_layers + [d_out]
    return passes * 2 * rows * sum(dims)


def activation_bytes():
    """Total estimated HBM activation traffic per step (fwd+bwd), incl.
    the [rows, 2-3L] concat inputs the cells materialize."""
    calls = [
        (N, 3, H, L, 3), (E, 6, H, L, 2),                       # encoders
        *([(N, 2 * L, H, L, 3), (E, 3 * L, H, L, 2)] * ITERS_IN),
        (N, L, H, 8, 3),                                        # emb head
        (C, L, H, L - 8, 3), (E_SUP, 2 * L, H, L, 2),           # super enc
        *([(N, 3 * L, H, L, 3), (E, 3 * L, H, L, 2),
           (C, 3 * L, H, L, 3), (E_SUP, 3 * L, H, L, 2)] * ITERS_HGNN),
        (E_BIP, 2 * L, H, 1, 3),                                # score head
    ]
    return sum(mlp_act_bytes(*c) for c in calls)


def aggregation_edges():
    """Edge traversals through the sorted-native kernels per FORWARD:
    each aggregation or kernel-backed endpoint gather streams its edge
    set once (the bench rate is measured per edge at D=256)."""
    a = {}
    # IN cells: 1 agg (edge->node) + 1 two-endpoint gather per iteration
    a["in_cells"] = ITERS_IN * (E + 2 * E)
    # HGNN cells: edge->node agg, bip->super, bip->node, super->super,
    # endpoint gathers for edge + superedge updates
    a["hgnn_cells"] = ITERS_HGNN * (E + E_BIP + E_BIP + E_SUP
                                    + 2 * E + 2 * E_SUP)
    # clustering likelihood (endpoint gather, d=8 ~ cheap but streamed)
    a["clustering"] = 2 * E
    # supernode/superedge init aggregations
    a["init"] = E_BIP + 2 * E_SUP
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, required=True,
                    help="measured 1-chip flagship train step (bf16, "
                         "scaling_r05.json)")
    ap.add_argument("--agg-rate-bf16", type=float, default=649e6,
                    help="measured sorted-native aggregation rate, edges/s "
                         "(BENCH bf16 line)")
    ap.add_argument("--knn-ms", type=float, default=10.5,
                    help="measured in-step kNN cost (bipartite + super)")
    ap.add_argument("--replicated-ms", type=float, default=None,
                    help="measured pooled replicated remainder "
                         "(profile_phases pooled_replicated_remainder_ms)")
    ap.add_argument("--bwd-factor", type=float, default=3.0,
                    help="fwd+bwd FLOP multiple of fwd (dgrad+wgrad)")
    ap.add_argument("--mxu-util", type=float, default=0.6,
                    help="achievable MXU utilization for these row counts "
                         "(24k/98k rows x 256..512 dims)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    fwd = forward_mlp_flops()
    fwd_total = sum(fwd.values())
    total_flops = args.bwd_factor * fwd_total

    t_mlp_peak_ms = total_flops / PEAK_BF16 * 1e3
    t_mlp_ach_ms = t_mlp_peak_ms / args.mxu_util

    agg = aggregation_edges()
    agg_total = sum(agg.values())
    # backward: each aggregation has a mirror (gather) and vice versa; the
    # kernel-backed VJPs stream the same edge sets again (~2x forward)
    agg_traversals = 2 * agg_total
    t_agg_ms = agg_traversals / args.agg_rate_bf16 * 1e3

    act_bytes = activation_bytes()
    t_act_ms = act_bytes / PEAK_HBM * 1e3

    t_knn_ms = args.knn_ms
    t_repl_ms = args.replicated_ms or 0.0

    # GEMM compute and activation streaming overlap imperfectly; the floor
    # takes max(MXU, HBM) per the roofline, plus the serial phases
    floor_ms = max(t_mlp_ach_ms, t_act_ms) + t_agg_ms + t_knn_ms + t_repl_ms
    mfu = total_flops / (args.step_ms / 1e3) / PEAK_BF16

    report = {
        "metric": "flagship_roofline",
        "shape": {"n_nodes": N, "e_directed": E, "e_bipartite": E_BIP,
                  "e_super": E_SUP, "clusters": C, "latent": L, "hidden": H,
                  "iters": [ITERS_IN, ITERS_HGNN]},
        "mlp_gemm_flops_fwd_by_phase": {k: round(v / 1e9, 2)
                                        for k, v in fwd.items()},
        "mlp_gemm_tflops_total_fwd_bwd": round(total_flops / 1e12, 3),
        "aggregation_edge_traversals_fwd": agg,
        "aggregation_edge_traversals_total": agg_traversals,
        "inputs": {"step_ms": args.step_ms,
                   "agg_rate_bf16_edges_per_s": args.agg_rate_bf16,
                   "knn_ms": args.knn_ms,
                   "replicated_ms": args.replicated_ms,
                   "bwd_factor": args.bwd_factor,
                   "mxu_util_assumed": args.mxu_util},
        "decomposition_ms": {
            "mlp_at_peak_bf16": round(t_mlp_peak_ms, 1),
            "mlp_at_assumed_util": round(t_mlp_ach_ms, 1),
            "activation_stream_at_hbm_peak": round(t_act_ms, 1),
            "aggregations_gathers_at_measured_rate": round(t_agg_ms, 1),
            "knn_measured": round(t_knn_ms, 1),
            "replicated_remainder_measured": round(t_repl_ms, 1),
            "floor_total": round(floor_ms, 1),
            "measured_step": args.step_ms,
            "unaccounted": round(args.step_ms - floor_ms, 1),
        },
        "activation_bytes_gb": round(act_bytes / 1e9, 2),
        "mfu_pct_of_bf16_peak": round(100 * mfu, 2),
        "headroom_x": round(args.step_ms / floor_ms, 2),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "roofline_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
