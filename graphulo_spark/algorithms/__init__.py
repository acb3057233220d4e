"""Graph algorithms as superstep loops over the linalg kernels."""

from graphulo_spark.algorithms.bfs import adj_bfs
from graphulo_spark.algorithms.cc import connected_components
from graphulo_spark.algorithms.jaccard import jaccard
from graphulo_spark.algorithms.ktruss import ktruss
from graphulo_spark.algorithms.label_prop import label_propagation
from graphulo_spark.algorithms.nmf import nmf, reconstruction_error
from graphulo_spark.algorithms.pagerank import pagerank
from graphulo_spark.algorithms.scc import scc
from graphulo_spark.algorithms.triangles import triangle_count, edge_support

__all__ = [
    "adj_bfs",
    "connected_components",
    "jaccard",
    "ktruss",
    "label_propagation",
    "nmf",
    "reconstruction_error",
    "pagerank",
    "scc",
    "triangle_count",
    "edge_support",
]
