"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of graphulo_spark.entry: ``entry(spark)`` runs the flagship
copurchase-graph PageRank on sf0.001; ``queries()`` exposes every implemented
operator from SURVEY.md §2 (plus the training-data pipeline ops) as
(spark, sf_dir) callables; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each (identical column names/values — see the float-parity policy in
graphulo_spark/entry.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphulo_spark.entry import entry, oracle_sql, queries  # noqa: E402,F401
