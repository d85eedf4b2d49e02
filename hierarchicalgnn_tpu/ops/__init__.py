from hierarchicalgnn_tpu.ops.graph import (  # noqa: F401
    Graph, bidirectionalize, symmetrize, dedup_edges, compact_mask,
    count_degrees,
)
from hierarchicalgnn_tpu.ops.segment import (  # noqa: F401
    segment_sum, segment_mean, segment_min, segment_max, segment_count,
    gather_segment_sum, make_aggregator,
)
from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (  # noqa: F401
    SortedPlan, build_sorted_plan, build_transposed_plan,
    gather_edge_endpoints, sorted_aggregate, sorted_segment_min_i32,
)
from hierarchicalgnn_tpu.ops.sddmm import (  # noqa: F401
    edge_dot, edge_distance, edge_squared_distance, edge_cosine_likelihood,
)
from hierarchicalgnn_tpu.ops.knn import knn, knn_to_edges, knn_graph  # noqa: F401
from hierarchicalgnn_tpu.ops.connected import (  # noqa: F401
    connected_components, cluster_labels, compact_labels,
)
from hierarchicalgnn_tpu.ops.intersect import edges_in_set  # noqa: F401
from hierarchicalgnn_tpu.ops.gmm import GMM2, fit_gmm2, solve_cut  # noqa: F401
