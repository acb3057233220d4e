from graphulo_spark.streaming.edges import stream_edge_counts, stream_induce_edges

__all__ = ["stream_edge_counts", "stream_induce_edges"]
