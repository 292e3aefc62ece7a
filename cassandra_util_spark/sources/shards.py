"""Epoch materialization: write a deterministically-sharded corpus as
one sorted parquet file per training shard.

The read side of a training loader wants: (a) a fixed number of shard
files, (b) rows inside each file already in epoch order, (c) bytes that
reproduce exactly for a given (corpus, seed).  `deterministic_shards`
provides the (shard, pos) assignment as pure hash expressions; this sink
realizes it physically: repartition by the shard column (hash exchange,
one partition per shard) + sortWithinPartitions(pos) (partition-local
sort — never a global range sort) + partitionBy(shard) so each shard is
an independently listable directory.  maxRecordsPerFile splits oversized
shards into size-bounded, still-ordered files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.operators.sampling import deterministic_shards


def write_epoch_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int,
    seed: str = "shard",
    max_records_per_file: int | None = None,
) -> None:
    """Materialize ``df`` as ``num_shards`` epoch-ordered parquet shards
    under ``path`` (directories ``shard=N/``), rows inside each shard in
    the deterministic hash order a seed change re-deals.

    One hash exchange + per-partition sorts; the write is append-free
    overwrite so re-runs are idempotent byte-for-byte (same corpus, same
    seed ⇒ same files).
    """
    sharded = deterministic_shards(df, key_col, num_shards, seed)
    writer = (
        sharded.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_epoch_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard of a materialized epoch, in stored (pos) order — partition
    pruning makes this a 1/num_shards scan."""
    return spark.read.parquet(path).filter(F.col("shard") == shard).orderBy("pos")
