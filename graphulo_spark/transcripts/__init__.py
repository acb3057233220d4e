from graphulo_spark.transcripts.generator import generate_transcripts
from graphulo_spark.transcripts.edges import induce_edges, entity_expr, vertex_labels

__all__ = ["generate_transcripts", "induce_edges", "entity_expr", "vertex_labels"]
