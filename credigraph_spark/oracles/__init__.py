from credigraph_spark.oracles.pagerank_pandas import pagerank_oracle  # noqa: F401
from credigraph_spark.oracles.graph_py import (  # noqa: F401
    cc_oracle,
    lpa_oracle,
    lpa_weighted_oracle,
    triangles_oracle,
    scc_oracle,
    bowtie_oracle,
    ktruss_oracle,
    harmonic_oracle,
    closeness_oracle,
    sssp_oracle,
    eccentricity_oracle,
    katz_oracle,
    modularity_oracle,
    anf_oracle,
    betweenness_oracle,
)
