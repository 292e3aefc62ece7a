"""Z-order layout: Morton-key correctness against a pure-Python reference
and the actual pruning payoff — files laid out in Z-order must have TIGHT
per-file footer stats on EVERY z-column, where a single-column sort leaves
every file covering the full range of the second column."""

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.operators.zorder import (
    write_zordered,
    zorder_file_stats,
    zorder_key,
)


def _ref_morton(vals, mins, maxs, bits):
    m = (1 << bits) - 1
    z = 0
    ways = len(vals)
    for i, (v, mn, mx) in enumerate(zip(vals, mins, maxs)):
        bucket = (v - mn) * m // max(mx - mn, 1)
        for b in range(bits):
            if bucket >> b & 1:
                z |= 1 << (b * ways + i)
    return z


@pytest.mark.parametrize("ways,bits", [(2, 16), (2, 8), (3, 10), (3, 6)])
def test_zorder_key_matches_reference_interleave(spark, ways, bits):
    rows = [(i, (i * 37) % 1000, (i * 91) % 500, (i * 13) % 77) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint, c bigint")
    cols = ["a", "b", "c"][:ways]
    got = {
        r["id"]: r["zvalue"]
        for r in zorder_key(df, cols, bits=bits).select("id", "zvalue").collect()
    }
    mins = [min(r[k + 1] for r in rows) for k in range(ways)]
    maxs = [max(r[k + 1] for r in rows) for k in range(ways)]
    for r in rows:
        want = _ref_morton(list(r[1 : 1 + ways]), mins, maxs, bits)
        assert got[r[0]] == want, (r, got[r[0]], want)


def test_zorder_layout_prunes_on_every_column(spark, tmp_path):
    """The point of the layout: after write_zordered on (a, b), a point
    range on EITHER column excludes most files by footer stats.  The
    contrast layout (sorted by a alone) prunes on a but NOT on b."""
    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("b"),
    )
    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, ["a", "b"], num_files=16)

    lpath = str(tmp_path / "linear")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lpath)

    def files_matching(stats, col, lo, hi):
        return sum(
            1
            for s in stats
            if not (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
        )

    zs = zorder_file_stats(zpath, ["a", "b"])
    ls = zorder_file_stats(lpath, ["a", "b"])
    nz, nl = len(zs), len(ls)
    width = n // 16  # one-sixteenth of either key range
    # both layouts prune on a
    assert files_matching(zs, "a", 0, width) <= nz // 2
    assert files_matching(ls, "a", 0, width) <= 2
    # only the Z layout prunes on b — the single-column sort leaves every
    # file spanning b's full range
    assert files_matching(ls, "b", 0, width) == nl
    assert files_matching(zs, "b", 0, width) <= nz // 2, zs

    # and the data is intact
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("a")).collect()[0][0] == n * (n - 1) // 2


def test_zorder_validation(spark):
    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="2 or 3 columns"):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError, match=r"\[1,16\]"):
        zorder_key(df, ["a", "b"], bits=17)
    # constant column (range 0) must not divide by zero; NULLs bucket to min
    const = spark.range(5).select(F.lit(7).alias("a"), F.col("id").alias("b"))
    assert zorder_key(const, ["a", "b"]).count() == 5
