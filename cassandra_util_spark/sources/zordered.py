"""Z-ordered parquet materialization: the physical half of
``functions/zorder.py``.

Sorting a table by the Morton interleave of several columns before writing
means every parquet row group's min/max statistics are TIGHT in every
interleaved dimension — a reader filtering on ANY of them skips most row
groups, where a single-column sort gives one dimension perfect stats and
the others none.  This is Delta's OPTIMIZE ZORDER as plain open parquet.

Plan shape: repartitionByRange on the z-value (range exchange — sampled
boundaries, one shuffle) + sortWithinPartitions (partition-local sort,
never a global sort) + write.  Readers need no special support: parquet
predicate pushdown consumes the row-group stats automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.functions.zorder import zorder_value


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[Column],
    num_files: int,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered by the
    z-interleave of ``cols`` (non-negative integer expressions — rank or
    bucket continuous values first).  The z-value is a transient sort key;
    it is not stored."""
    z = zorder_value(cols, bits)
    writer = (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def file_stat_spans(path: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) spans of ``cols`` from the parquet FOOTERS —
    the statistics a reader's row-group pruning actually consumes.  The
    audit tool for layout quality: tight spans ⇒ effective skipping.
    Driver-side metadata read only; no data is scanned."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        spans = {}
        for c in cols:
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is not None and st.has_min_max:
                    los.append(st.min)
                    his.append(st.max)
            if los:
                spans[c] = (min(los), max(his))
        out.append({"file": name, **spans})
    return out
