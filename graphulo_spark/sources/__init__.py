from graphulo_spark.sources.graph500 import read_triple_files
from graphulo_spark.sources.d4m import d4m_row_predicate, parse_d4m_ranges
from graphulo_spark.sources.iceberg import (
    load_transcripts,
    source_input_fp,
    transcripts_fingerprint,
)

__all__ = [
    "read_triple_files",
    "d4m_row_predicate",
    "parse_d4m_ranges",
    "load_transcripts",
    "source_input_fp",
    "transcripts_fingerprint",
]
