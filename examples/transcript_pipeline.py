"""End-to-end link-graph pipeline over conversation transcripts, driven
through the engine's real deployment surface (spark-submit --py-files).

    zip -r graphulo_spark.zip graphulo_spark
    spark-submit --master local[8] --py-files graphulo_spark.zip \
        examples/transcript_pipeline.py /tmp/run full 12

Stages (each printing one JSON line):
  transcripts  -> deterministic synthetic transcript table (swap for
                  sources.load_transcripts("catalog.db.transcripts") on a
                  real Iceberg deployment — identical schema either way)
  edges        -> lag-window entity co-occurrence induction + symmetrize
  pagerank     -> checkpointed supersteps (kill this process mid-run, rerun
                  with mode=resume: final ranks are bitwise-identical)
  cc/triangles -> exact component and triangle counts
  similarity   -> IVF top-k against the brute-force scan + near-dup pass
  nmf/rowop    -> factorization + whole-row-UDTF SpGEMM cross-check
  streaming    -> stateful cross-batch induction equals the batch derivation

Usage: spark-submit ... transcript_pipeline.py <run_dir> <mode> <iters>
mode: full | resume
"""
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

run_dir, mode, iters = sys.argv[1], sys.argv[2], int(sys.argv[3])

spark = (
    SparkSession.builder.appName("transcript-pipeline")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from graphulo_spark.transcripts import generate_transcripts, induce_edges, vertex_labels
from graphulo_spark.linalg import symmetrize
from graphulo_spark.algorithms import connected_components, pagerank
from graphulo_spark.algorithms.triangles import triangle_count

t = generate_transcripts(spark, 500)
print(json.dumps({"n_turns": t.count()}))
edges = symmetrize(induce_edges(t)).localCheckpoint()
print(json.dumps({"n_edges": edges.count()}))

ranks = pagerank(
    spark, edges, tol=0.0, max_iter=iters,
    checkpoint_dir=f"{run_dir}/pagerank", resume=(mode == "resume"),
)
labels = vertex_labels(t)
top5 = (
    ranks.join(labels, ranks["v"] == labels["v"])
    .select("entity", F.round("rank", 10).alias("rank"))
    .orderBy(F.desc("rank"), "entity").limit(5).collect()
)
print(json.dumps({"top5": [[r["entity"], r["rank"]] for r in top5]}))

cc = connected_components(spark, edges)
print(json.dumps({"n_components": cc.select("component").distinct().count()}))
print(json.dumps({"n_triangles": triangle_count(edges)}))

# embedding similarity over a deterministic synthetic embedding table:
# 3 planted near-identical clusters + noise vectors
emb = spark.range(0, 300).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda d: F.when(
            F.col("id") < 30,
            F.cos(d * (F.pmod(F.col("id"), F.lit(3)) + 1)) + F.col("id") * 1e-4
        ).otherwise(F.sin(d * F.col("id") * 0.37) + F.cos(d + F.col("id"))),
    ).alias("embedding"),
)
from graphulo_spark.pipeline.similarity import cosine_topk, embedding_near_dup, ivf_topk

qset = emb.orderBy("vec_id").limit(3)
brute = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, qset, k=3).collect()}
full_probe = {(r["query_id"], r["vec_id"])
              for r in ivf_topk(emb, qset, k=3, n_cells=4, n_probe=4, iters=1).collect()}
print(json.dumps({"ivf_fullprobe_equals_brute": full_probe == brute}))

nd = embedding_near_dup(emb, threshold=0.999, n_planes=4, n_tables=3)
rows = nd.collect()
by_rep = {}
for r in rows:
    by_rep[r["dup_of"]] = by_rep.get(r["dup_of"], 0) + 1
print(json.dumps({"near_dup_rows": len(rows), "reps": sorted(by_rep.items())[:5]}))

# corpus dedup: turn texts are unique by construction, so plant a dup-heavy
# sub-corpus deterministically — ~30% of docs collapse onto 50 templates,
# each in two variants differing by one trailing token (trigram jaccard
# 9/11 ≈ 0.82 ≥ the 0.8 verify threshold). Exact star edges merge same-
# variant copies; verified near pairs merge the two variants of a template;
# the engine's own connected_components closes the families transitively.
from graphulo_spark.pipeline.dedup import dedup_clusters

base = t.select(F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text")
tid = F.pmod("doc_id", 50).cast("string")
tmpl = F.concat_ws(
    " ",
    *[F.concat(F.lit(w), tid) for w in "abcdefghijk"],  # 11 template-specific tokens
    F.concat(F.lit("v"), F.pmod("doc_id", 2).cast("string")),  # 1 variant token
)
docs = base.withColumn(
    "text", F.when(F.pmod("doc_id", 10) < 3, tmpl).otherwise(F.col("text"))
)
dc = dedup_clusters(spark, docs)
stats = dc.agg(
    F.count("*").alias("docs"), F.countDistinct("cluster_id").alias("clusters")
).collect()[0]
keepers = dc.filter(F.col("doc_id") == F.col("cluster_id")).count()
families = dc.groupBy("cluster_id").count().filter(F.col("count") > 1).count()
print(json.dumps({
    "dedup_docs": stats["docs"],
    "dedup_clusters": stats["clusters"],
    "dup_families": families,
    "keepers_equal_clusters": keepers == stats["clusters"],
}))

# NMF factorization + frozen-H projection of "new" rows (doHT_HHTinv)
from graphulo_spark.algorithms.nmf import assign_topics, nmf, reconstruction_error

w_f, h_f = nmf(spark, edges, k=2, max_iter=2)
err = reconstruction_error(edges, w_f, h_f, 2)
newrows = assign_topics(edges.filter("src % 2 != 0"), h_f, 2)
print(json.dumps({"nmf_err_finite": err == err and err >= 0.0,
                  "assigned_rows": newrows.count()}))

# RowMultiplyOp path vs join+aggregate SpGEMM on the real induced edge table
from graphulo_spark.linalg import spgemm
from graphulo_spark.linalg.rowmult import table_mult_rowop

small_edges = edges.limit(2000).localCheckpoint()
aa = {(r["src"], r["dst"]): r["w"] for r in spgemm(small_edges, small_edges).collect()}
bb = {(r["src"], r["dst"]): r["w"] for r in table_mult_rowop(small_edges, small_edges).collect()}
print(json.dumps({"rowop_cells": len(bb), "rowop_matches_spgemm": aa == bb}))

# stateful streaming: chop every conversation in half across two files; the
# applyInPandasWithState inducer must reproduce the batch edge table exactly
from graphulo_spark.streaming.edges import (
    resolve_edge_entities, stream_induce_edges_stateful,
)

sdir = f"{run_dir}/stream"
small = generate_transcripts(spark, 60).cache()
small.filter("turn_idx < 5").coalesce(1).write.mode("append").parquet(f"{sdir}/in")
small.filter("turn_idx >= 5").coalesce(1).write.mode("append").parquet(f"{sdir}/in")
q = stream_induce_edges_stateful(
    spark, f"{sdir}/in", f"{sdir}/out", f"{sdir}/ck", max_files_per_trigger=1
)
q.awaitTermination(240)
got = {(r["src"], r["dst"]): r["w"]
       for r in resolve_edge_entities(spark.read.parquet(f"{sdir}/out")).collect()}
want = {(r["src"], r["dst"]): r["w"]
        for r in induce_edges(small, include_participant=False).collect()}
print(json.dumps({"stream_edges": len(got), "stream_matches_batch": got == want}))
spark.stop()
