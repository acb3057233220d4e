"""Graph500 triple-file ingestion.

Reference: util/TripleFileWriter.java:1-380 bulk-loads paired row/col text
files (one vertex id per delimiter-separated token; the reference ships
SCALE-10 pairs as src/test/resources/data/10Ar.txt / 10Ac.txt) into
adjacency/incidence/degree tables; tricount/TriangleIngestor.java:39-378 is
the lexicoder variant. Spark restatement: read both files, zip by position,
emit the edge DataFrame — degree tables come from linalg.degrees.
"""

from __future__ import annotations

import re

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
    src of the i-th edge, i-th token of col_file its dst.

    Positions are derived DETERMINISTICALLY, not from physical row order:
    each file is read wholetext (one row per file — these are bulk-load seed
    files, not the 100 TB path), tokens get their index from posexplode, and
    multi-file globs are offset by a per-file prefix computed over the (tiny)
    file list — so src/dst can never silently misalign under repartitioning.
    """

    def _tokens(path: str, name: str) -> DataFrame:
        raw = spark.read.text(path, wholetext=True).select(
            F.input_file_name().alias("_file"), F.col("value")
        )
        sep = f"(?:{re.escape(delimiter)}|\\s)+"  # wholetext: newlines separate too
        toks = raw.select(
            "_file",
            F.posexplode(F.split(F.trim(F.col("value")), sep)).alias("_raw_i", name),
        ).filter(F.col(name) != "")
        # index AFTER the empty-token filter (a file starting with the
        # delimiter would otherwise shift every surviving token by one while
        # _n counts only survivors — src/dst misalign). _raw_i keeps the
        # within-file order deterministic; row_number renumbers the survivors.
        wi = Window.partitionBy("_file").orderBy("_raw_i")
        toks = toks.select("_file", (F.row_number().over(wi) - 1).alias("_i"), name)
        # cross-file offset: tokens-per-file is a |files|-row table; prefix it
        # with a window ordered by file name (deterministic) and add back
        per_file = toks.groupBy("_file").agg(F.count("*").alias("_n"))
        wf = Window.orderBy("_file").rowsBetween(Window.unboundedPreceding, -1)
        prefix = per_file.select("_file", F.coalesce(F.sum("_n").over(wf), F.lit(0)).alias("_off"))
        return toks.join(F.broadcast(prefix), "_file").select(
            (F.col("_off") + F.col("_i")).alias("_pos"), name
        )

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
