"""Graph500 triple-file ingestion.

Reference: util/TripleFileWriter.java:1-380 bulk-loads paired row/col text
files (one vertex id per delimiter-separated token; the reference ships
SCALE-10 pairs as src/test/resources/data/10Ar.txt / 10Ac.txt) into
adjacency/incidence/degree tables; tricount/TriangleIngestor.java:39-378 is
the lexicoder variant. Spark restatement: read both files, zip by position,
emit the edge DataFrame — degree tables come from linalg.degrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_triple_files(
    spark: SparkSession,
    row_file: str,
    col_file: str,
    *,
    delimiter: str = ",",
    deduplicate: bool = True,
) -> DataFrame:
    """Edge table from paired row/col files: i-th token of row_file is the
    src of the i-th edge, i-th token of col_file its dst. Positions are
    aligned with a window row_number (both files read whole — these are
    bulk-load seed files, not the 100 TB path)."""

    def _tokens(path: str, name: str) -> DataFrame:
        raw = spark.read.text(path)
        toks = raw.select(F.explode(F.split(F.trim(F.col("value")), delimiter)).alias(name))
        toks = toks.filter(F.col(name) != "")
        return toks.withColumn("_pos", F.row_number().over(Window.orderBy(F.monotonically_increasing_id())))

    rows = _tokens(row_file, "src")
    cols = _tokens(col_file, "dst")
    edges = (
        rows.join(cols, "_pos")
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    if deduplicate:
        return edges.groupBy("src", "dst").agg(F.count("*").cast("double").alias("w"))
    return edges.withColumn("w", F.lit(1.0))
