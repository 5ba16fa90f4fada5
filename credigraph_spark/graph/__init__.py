from credigraph_spark.graph.adjacency import (  # noqa: F401
    clean_edges,
    symmetrize,
    out_degrees,
    in_degrees,
    degrees,
    build_adjacency,
)
from credigraph_spark.graph.pagerank import pagerank  # noqa: F401
from credigraph_spark.graph.ppr import (  # noqa: F401
    personalized_pagerank,
    ppr_batch,
    ppr_sweep_cut,
)
from credigraph_spark.graph.components import (  # noqa: F401
    connected_components,
    connected_components_incremental,
)
from credigraph_spark.graph.mis import (  # noqa: F401
    maximal_independent_set,
)
from credigraph_spark.graph.louvain import (  # noqa: F401
    louvain_local_move,
    louvain_two_level,
)
from credigraph_spark.graph.lpa import label_propagation  # noqa: F401
from credigraph_spark.graph.triangles import (  # noqa: F401
    directed_triad_census,
    dyad_census,
    triangle_count,
    weighted_clustering_coefficient,
    clustering_coefficient,
    k_truss,
)
from credigraph_spark.graph.hits import hits, hits_to_convergence  # noqa: F401
from credigraph_spark.graph.kcore import coreness, k_core, s_core  # noqa: F401
from credigraph_spark.graph.linkpred import (  # noqa: F401
    cocitation_scores,
    cocitation_topk,
    link_prediction_scores,
    link_prediction_topk,
    negative_samples,
)
from credigraph_spark.graph.nhop import (  # noqa: F401
    bfs_distances,
    n_hop_subgraph,
    per_seed_distances,
    harmonic_centrality,
    closeness_centrality,
    diameter_2approx,
    eccentricity,
)
from credigraph_spark.graph.katz import katz_centrality  # noqa: F401
from credigraph_spark.graph.anf import (  # noqa: F401
    anf_sketch,
    effective_diameter,
    effective_diameter_hops,
)
from credigraph_spark.graph.salsa import salsa  # noqa: F401
from credigraph_spark.graph.simrank import simrank2_topk  # noqa: F401
from credigraph_spark.graph.mst import boruvka_msf  # noqa: F401
from credigraph_spark.graph.coloring import luby_coloring  # noqa: F401
from credigraph_spark.graph.butterflies import butterfly_count  # noqa: F401
from credigraph_spark.graph.trust import (  # noqa: F401
    spam_mass,
    top_indegree_seeds,
    trustrank,
)
from credigraph_spark.graph.spreading import (  # noqa: F401
    eigenvector_centrality,
    fiedler_vector,
    label_spreading,
)
from credigraph_spark.graph.sssp import (  # noqa: F401
    earliest_arrival,
    weighted_closeness_centrality,
    weighted_harmonic_centrality,
    weighted_per_seed_distances,
    weighted_sssp,
)
from credigraph_spark.graph.betweenness import (  # noqa: F401
    betweenness_from_seeds,
    weighted_betweenness_from_seeds,
)
from credigraph_spark.graph.walks import (  # noqa: F401
    deterministic_walks,
    node2vec_walks,
)
from credigraph_spark.graph.scc import (  # noqa: F401
    strongly_connected_components,
    bowtie_classes,
)
from credigraph_spark.graph.sampling import sample_neighbors  # noqa: F401
from credigraph_spark.graph.pregel import aggregate_messages, messages, triplets  # noqa: F401
