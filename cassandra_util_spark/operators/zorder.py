"""Z-order (Morton) clustering: multi-column data skipping for the file
layout, the lakehouse ``OPTIMIZE ZORDER BY`` analog.

The run store and `KeyedTable.clustered()` sort by the PARTITION KEY, so
parquet min/max stats prune scans filtered on that key — but a filter on a
second column still touches every file (each file spans the full range of
every non-leading column).  Z-ordering interleaves the bits of several
columns' rank-bucketed values into one sort key, so files become
rectangles in N-dimensional key space: a selective filter on ANY of the
z-columns prunes to ~sqrt-ish of the files instead of none (Morton 1966;
the same layout Delta/Iceberg expose as table maintenance).

Engine shape (100 TB):
- ``zorder_key`` is PURE EXPRESSIONS: one bounded stats aggregate
  (min/max per column — a 1-row broadcast), then exact integer bucket +
  bit-spread arithmetic per row.  No shuffle beyond the final
  range-partitioned write; bit-spreading is the classic magic-number
  shift cascade, whole-stage-codegen friendly.
- ``write_zordered`` lays files out by ``repartitionByRange(zvalue)`` +
  in-partition sort — each output file covers a compact Z-range, which is
  exactly what makes its per-column min/max footer stats TIGHT.
- Everything is exact bigint arithmetic over a documented input range
  (|col - min| · (2^bits − 1) must fit int64 — bits=16 leaves ~2.8e14 of
  key range), so the key is reproducible in any engine: the contract
  query's DuckDB oracle replays the identical bucket + interleave math.

Reference anchor: the reference relies on Cassandra's per-sstable
clustering for scan pruning (FilteringSSTableScanner skips by key range);
this generalizes that one-dimensional pruning to multiple columns for the
parquet layout.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "zvalue",
) -> DataFrame:
    """Append the Morton key of ``cols`` (2 or 3 numeric columns).

    Each column is bucketed to ``bits`` bits by exact integer arithmetic
    over its observed [min, max] — ``(col − min) · (2^bits − 1) div range``
    — then bit-spread and interleaved.  The stats row is a broadcast
    cross-join (one bounded aggregate, the O(K) collect discipline kept
    declarative); NULLs bucket to 0 (sort first, like NULLS FIRST).
    """
    from cassandra_util_spark.functions.zorder import zorder_value

    if len(cols) not in (2, 3):
        raise ValueError(f"zorder_key supports 2 or 3 columns, got {len(cols)}")
    ways = len(cols)
    max_bits = 16 if ways == 2 else 10  # fast-cascade domains (functions.zorder)
    if ways == 3 and bits == 16:
        bits = 10  # the 2-col signature default, clamped to the 3-col domain
    if not 1 <= bits <= max_bits:
        raise ValueError(f"bits must be in [1,{max_bits}] for {ways} columns, got {bits}")
    m = (1 << bits) - 1
    stats = df.agg(
        *[F.min(F.col(c).cast("bigint")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("bigint")).alias(f"__mx_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    buckets = [
        F.expr(
            f"(coalesce(cast({c} as bigint), __mn_{c}) - __mn_{c}) * {m} div "
            f"greatest(__mx_{c} - __mn_{c}, 1)"
        )
        for c in cols
    ]
    z = zorder_value(buckets, bits)  # one canonical interleave (functions.zorder)
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return with_stats.withColumn(out_col, z.cast("bigint")).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 16,
    mode: str = "errorifexists",
) -> None:
    """Write ``df`` as parquet laid out in Z-order on ``cols``.

    ``repartitionByRange(num_files, zvalue)`` gives each output file a
    compact Z-range (range partitioning samples the key — acceptable for a
    LAYOUT decision; the data itself is untouched), and the in-partition
    sort tightens per-file footer stats further.  Size ``num_files`` so
    files land near the row-group sweet spot (~128 MB-1 GB at warehouse
    scale)."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, F.col("zvalue"))
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_file_stats(path: str, cols: Sequence[str]) -> list:
    """Per-file (min, max) footer stats for ``cols`` — the pruning
    evidence: a predicate on any z-column skips every file whose range
    excludes it, exactly what the scan's row-group/file pruning consults."""
    import pyarrow.parquet as pq

    out = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in lo and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        out.append({"file": fn, **{f"{c}_min": lo[c] for c in cols}, **{f"{c}_max": hi[c] for c in cols}})
    return out
