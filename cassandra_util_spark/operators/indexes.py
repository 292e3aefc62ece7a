"""Secondary-index analog: derived index tables kept consistent with
retention by rewriting them with the same keep-expression.

The reference deletes index entries in-place while scanning (with a memtable
write-order lock, ``FilteringSSTableScanner.java:135-193``) and has a known
bug on the UPDATE path (``FilteringOnDiskAtomIterator.java:92-102``).  In the
Spark model an index is just another DataFrame derived from the base table,
so index maintenance is trivially correct: apply the identical predicate and
commit both snapshots; there is no in-place mutation to get wrong.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import KeyedTable
from cassandra_util_spark.operators.convictors import Convictor
from cassandra_util_spark.sources.snapshots import SnapshotStore


@dataclass(frozen=True)
class DerivedIndex:
    """An index = projection of (indexed column(s), primary key, includes)."""

    name: str
    indexed_cols: tuple[str, ...]
    include_cols: tuple[str, ...] = ()

    def build(self, table: KeyedTable) -> DataFrame:
        cols = list(self.indexed_cols) + list(table.meta.primary_key) + list(self.include_cols)
        # index layout: clustered by the indexed value for point lookups
        return (
            table.df.select(*dict.fromkeys(cols))
            .repartition(*[F.col(c) for c in self.indexed_cols])
            .sortWithinPartitions(*self.indexed_cols, *table.meta.primary_key)
        )


def retention_with_indexes(
    table: KeyedTable,
    convictor: Convictor,
    indexes: Sequence[DerivedIndex],
    store: Optional[SnapshotStore] = None,
    index_stores: Optional[dict[str, SnapshotStore]] = None,
) -> dict[str, DataFrame]:
    """Apply one retention pass to the base table AND every derived index
    with the same compiled predicate — the index-cleanup of the reference's
    scan loop, expressed as consistent snapshot rewrites.

    Returns {'base': kept_df, '<index>': kept_index_df, ...}; with stores,
    commits each (base last, so a failure leaves indexes ahead but never
    behind — re-running converges).
    """
    keep = convictor.keep_expr()
    out: dict[str, DataFrame] = {}
    for ix in indexes:
        kept_ix = ix.build(table.with_df(table.df.filter(keep)))
        out[ix.name] = kept_ix
        # same degradation-ladder guard as the base store: a spooked run
        # promises to delete NOTHING durably, index snapshots included
        if index_stores and ix.name in index_stores and not convictor.spooked:
            index_stores[ix.name].commit(kept_ix)
    kept = table.df.filter(keep)
    out["base"] = kept
    if store is not None and not convictor.spooked:
        store.commit(kept, meta=table.meta)
    return out
