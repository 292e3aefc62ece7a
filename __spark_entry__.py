"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (rule-based retention — the
reference's core capability) at sf0.001; ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_util_spark.entry_queries import ORACLES, QUERIES  # noqa: E402

# Import-time contract check (VERDICT r2 item 4): every registered query has a
# DuckDB oracle unless it is on the documented rows-only list (genuinely
# non-SQL-expressible ops).  A silently oracle-less query would downgrade the
# driver's correctness gate for that row without anyone noticing.
_ROWS_ONLY_OK: frozenset[str] = frozenset()
_missing = sorted(set(QUERIES) - set(ORACLES) - _ROWS_ONLY_OK)
if _missing:  # explicit raise — a bare assert vanishes under python -O
    raise AssertionError(f"queries registered without an oracle: {_missing}")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["retention_rules_delete"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
