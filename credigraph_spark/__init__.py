"""credigraph_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities mirror ekmpa/CrediGraph (see SURVEY.md): edge-table extraction
from a repository corpus, deterministic distributed vertex-ID assignment,
iterative PageRank / connected components / label propagation / triangle
counting over hash-partitioned adjacency DataFrames, degree/topology
analytics, enrichment joins, and large-scale training-data pipeline ops
(dedup, similarity search, text stats).

Everything is expressed as Spark DataFrame programs (Catalyst-optimizable);
Python touches data only through Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
