"""Driver-contract query registry: every implemented operator exposed as a
(spark_builder, duckdb_oracle_sql) pair over the driver's parquet tables.

Each builder takes (spark, sf_dir) and returns a DataFrame; the oracle is the
ANSI-SQL equivalent DuckDB runs on the same parquet (views pre-registered:
region nation customer supplier part orders lineitem events documents
embeddings).  Column names are aliased identically on both sides — the driver
sorts columns by name and value-hashes order-insensitively.

Determinism rules used throughout:
- money/summed values computed in DECIMAL (float summation is order-dependent
  across engines/partitionings);
- timestamps exported as epoch integers (`unix_micros`/`epoch_us`), never raw
  timestamp cells;
- every top-k/window has a total tiebreak order.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import KeyedTable, TableMeta
from cassandra_util_spark.functions import (
    normalize_event_time,
    portable_token,
    writetime_micros,
)
from cassandra_util_spark.functions.windows import constant_partition_key as _cpk
from cassandra_util_spark.operators.convictors import (
    ConfigurableDeleter,
    RuleBasedDeletionConvictor,
    RuleBasedLateTTLConvictor,
    create_convictor,
)
from cassandra_util_spark.operators.merge import counter_merge, lww_merge, merge_snapshots
from cassandra_util_spark.operators.text import (
    regex_token_count as _tokcount,
    regex_token_count_sql as _tokcount_sql,
)
from cassandra_util_spark.plans.rules import Range, Rule

# ONE tokenization definition on both engines (ADVICE r12): every
# token-counting oracle interpolates this generated fragment instead of
# hand-inlining the regex, so a BPE_TOKEN_REGEX tweak can never
# desynchronize the oracle side from the Spark side.
_REGEX_TOKS_SQL = _tokcount_sql("text")

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Pinned run clock for TTL queries: 2024-02-01T00:00:00Z (events span Jan 2024)
TTL_NOW_MS = 1_706_745_600_000


def query(name: str, oracle: Optional[str] = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Physical types each driver table's columns are allowed to arrive in.
# Timestamp-ish columns list every representation seen across Spark versions
# (TIMESTAMP on Spark 3, TIMESTAMP_NTZ on Spark 4's native nanos read, bigint
# under legacy nanosAsLong); _t normalizes those to TIMESTAMP.  Anything else
# fails fast with a message naming the column and type, instead of a deep
# Catalyst error downstream.
_TS_REPS = {"timestamp", "timestamp_ntz", "bigint"}
# date-only columns are never normalized (see _NORMALIZE_COLS), so a bigint
# arrival would sail past the gate and break literal predicates downstream —
# they accept only the two timestamp readings
_DATE_REPS = {"timestamp", "timestamp_ntz"}
_EXPECTED_TYPES: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int"}, "n_name": {"string"}, "n_regionkey": {"int"}},
    "customer": {
        "c_custkey": {"bigint"}, "c_name": {"string"}, "c_nationkey": {"int"},
        "c_acctbal": {"double"}, "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"}, "s_name": {"string"},
        "s_nationkey": {"int"}, "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"}, "p_name": {"string"}, "p_brand": {"string"},
        "p_type": {"string"}, "p_size": {"int"}, "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"}, "o_custkey": {"bigint"},
        "o_orderstatus": {"string"}, "o_totalprice": {"double"},
        "o_orderdate": _DATE_REPS, "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"}, "l_partkey": {"bigint"}, "l_suppkey": {"bigint"},
        "l_linenumber": {"int"}, "l_quantity": {"double"},
        "l_extendedprice": {"double"}, "l_discount": {"double"}, "l_tax": {"double"},
        "l_returnflag": {"string"}, "l_linestatus": {"string"}, "l_shipdate": _DATE_REPS,
    },
    "events": {
        "event_id": {"bigint"}, "ts": _TS_REPS, "user_id": {"bigint"},
        "event_type": {"string"}, "value": {"double"}, "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"}, "text": {"string"}, "lang": {"string"},
        "source": {"string"}, "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"}, "embedding": {"array<float>"}, "label": {"int"},
    },
}


# Columns normalized to canonical TIMESTAMP because they feed epoch-µs
# writetime arithmetic (unix_micros rejects NTZ).  Date-only columns
# (o_orderdate, l_shipdate) deliberately STAY at their native read type: the
# NTZ→TIMESTAMP cast wraps the column and defeats parquet filter pushdown
# (PushedFilters: [] on q1's shipdate predicate — a measured 1.5× regression),
# while NTZ literal comparisons push down natively and compare identically
# under the pinned UTC session tz.  No contract query pushes a literal
# predicate on events.ts, so its normalization costs no pruning.
_NORMALIZE_COLS = {"events": ("ts",)}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The DRIVER passes its own session here, which may carry different confs;
    # both of these are runtime-settable, so pin them defensively:
    #  - UTC session tz: makes the TIMESTAMP_NTZ→TIMESTAMP cast in
    #    normalize_event_time epoch-preserving (the reference's timestamps are
    #    timezone-free epoch-µs — CQLTimestamp.scala:17-40 — and DuckDB's
    #    epoch_us reads the same wall-clock as UTC), and keeps every
    #    date/time function deterministic across driver environments.
    #  - nanosAsLong: lets Spark 3.x read the events TIMESTAMP(NANOS) parquet
    #    at all (as int64 nanos); Spark 4 ignores it and reads NTZ natively.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    expected = _EXPECTED_TYPES.get(name, {})
    for field in df.schema.fields:
        allowed = expected.get(field.name)
        got = field.dataType.simpleString()
        if allowed is not None and got not in allowed:
            raise TypeError(
                f"table {name!r} column {field.name!r} has unexpected physical "
                f"type {got!r}; expected one of {sorted(allowed)} "
                "(did the parquet writer or a Spark upgrade change the schema?)"
            )
    for col in _NORMALIZE_COLS.get(name, ()):
        df = normalize_event_time(df, col)
    return df


# ---------------------------------------------------------------------------
# Retention (the reference's core capability)
# ---------------------------------------------------------------------------

@query(
    "retention_rules_delete",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE NOT (
          (l_orderkey >= 100 AND l_orderkey <= 500)
       OR ((l_suppkey >= 1 AND l_suppkey <= 3) AND l_partkey <= 50)
    )
    """,
)
def retention_rules_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based deletion (RuleBasedDeletionConvictor parity): OR over rules,
    AND over a rule's columns, inclusive text bounds typed by the column."""
    li = KeyedTable(
        _t(spark, sf_dir, "lineitem"),
        # composite partition key — rule columns must be key columns
        TableMeta(("l_orderkey", "l_suppkey", "l_partkey"), ("l_linenumber",)),
        "lineitem",
    )
    rules = [
        Rule("purge_orders", {"l_orderkey": (Range("100", "500"),)}),
        Rule(
            "purge_supplier_lowparts",
            {"l_suppkey": (Range("1", "3"),), "l_partkey": (Range(None, "50"),)},
        ),
    ]
    conv = RuleBasedDeletionConvictor(li, rules=rules)
    return li.df.filter(conv.keep_expr()).select("l_orderkey", "l_linenumber")


@query(
    "retention_ttl",
    oracle=f"""
    SELECT event_id FROM events
    WHERE NOT (
      (CASE WHEN user_id >= 1 AND user_id <= 50 THEN 1209600
            WHEN user_id >= 51 AND user_id <= 100 THEN -1
            ELSE 2419200 END) >= 0
      AND (({TTL_NOW_MS} - epoch_us(ts) // 1000) // 1000) >
          (CASE WHEN user_id >= 1 AND user_id <= 50 THEN 1209600
                WHEN user_id >= 51 AND user_id <= 100 THEN -1
                ELSE 2419200 END)
    )
    """,
)
def retention_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-TTL retention (RuleBasedLateTTLConvictor parity): min TTL among
    matching rules, negative TTL = keep forever, default TTL fallback,
    age vs microsecond writetime at a pinned run clock."""
    ev = _t(spark, sf_dir, "events").withColumn("writetime", writetime_micros(F.col("ts")))
    table = KeyedTable(ev, TableMeta(("user_id",), ("event_id",), "writetime"), "events")
    rules = [
        Rule("recent_users", {"user_id": (Range("1", "50"),)}, ttl=1_209_600),  # 14 d
        Rule("vip_keep_forever", {"user_id": (Range("51", "100"),)}, ttl=-1),
    ]
    conv = RuleBasedLateTTLConvictor(
        table, rules=rules, default_ttl=2_419_200, now_ms=TTL_NOW_MS  # 28 d default
    )
    return ev.filter(conv.keep_expr()).select("event_id")


@query(
    "configurable_delete_json",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE NOT (l_orderkey <= 1000 OR l_linenumber IN (1, 2, 7))
    """,
)
def configurable_delete_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-configured deleter (ConfigurableDeleter parity): single value =
    degenerate range, [null, x] = unbounded below, key columns only."""
    li = KeyedTable(
        _t(spark, sf_dir, "lineitem"),
        TableMeta(("l_orderkey",), ("l_linenumber",)),
        "lineitem",
    )
    conv = ConfigurableDeleter(
        li, delete_keys='{"l_orderkey": [[null, 1000]], "l_linenumber": [7, [1, 2]]}'
    )
    return li.df.filter(conv.keep_expr()).select("l_orderkey", "l_linenumber")


@query(
    "odd_pk_filter",
    oracle="SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 2 = 0",
)
def odd_pk_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Example-convictor parity (OddPartitionKeyDeleter): keep even pk."""
    li = KeyedTable(
        _t(spark, sf_dir, "lineitem"),
        TableMeta(("l_orderkey",), ("l_linenumber",)),
        "lineitem",
    )
    conv = create_convictor("odd_pk", li)
    return li.df.filter(conv.keep_expr()).select("l_orderkey", "l_linenumber")


@query(
    "token_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE ((l_orderkey * 2654435761) % 4294967296) < 2147483648
    """,
)
def token_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-aware routing surface (OddTokenDeleter / groupByFirstReplica
    analog) with an engine-portable token hash so the oracle can agree."""
    li = _t(spark, sf_dir, "lineitem")
    # keep the lower half of the token ring; parity of a multiplicative hash
    # would degenerate to key parity (low bits pass through), high bits mix
    return li.filter(portable_token(F.col("l_orderkey")) < F.lit(2_147_483_648)).select(
        "l_orderkey", "l_linenumber"
    )


# ---------------------------------------------------------------------------
# Merge semantics (compaction / counters / writetime)
# ---------------------------------------------------------------------------

@query(
    "lww_merge",
    oracle="""
    SELECT user_id, event_type, event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM (SELECT * FROM events UNION ALL
            SELECT * FROM events WHERE user_id <= 75)
    ) WHERE rn = 1
    """,
)
def lww_merge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins merge across overlapping runs (compaction merge;
    'handle overlapping keys' spec): newest writetime per key, value tiebreak."""
    ev = _t(spark, sf_dir, "events").withColumn("writetime", writetime_micros(F.col("ts")))
    runs = [ev, ev.filter(F.col("user_id") <= 75)]  # simulated re-delivered run
    meta = TableMeta(("user_id", "event_type"), (), "writetime")
    merged = merge_snapshots(runs, meta, tiebreak=["event_id"])
    return merged.select("user_id", "event_type", "event_id")


@query(
    "counter_merge",
    oracle="""
    SELECT user_id, event_type,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_total,
           COUNT(*) AS merge_count
    FROM events GROUP BY user_id, event_type
    """,
)
def counter_merge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-column merge (counter batches): increments sum per key, in
    DECIMAL so a 1000-executor sum equals the single-node oracle."""
    ev = _t(spark, sf_dir, "events")
    merged = counter_merge(ev, ["user_id", "event_type"], ["value"])
    # exact decimal sum internally, one deterministic final cast for export
    return merged.select(
        "user_id",
        "event_type",
        F.col("value_total").cast("double").alias("value_total"),
        "merge_count",
    )


@query(
    "writetime_projection",
    oracle="SELECT event_id, epoch_us(ts) AS writetime FROM events",
)
def writetime_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING TIMESTAMP surface: writetime is a first-class microsecond column."""
    return _t(spark, sf_dir, "events").select(
        "event_id", writetime_micros(F.col("ts")).alias("writetime")
    )


# ---------------------------------------------------------------------------
# SQL/analytics surface (free via Catalyst; exercised for plan quality)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2))) *
                    (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderpriority
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join; customer is the small side — Catalyst broadcast-joins it
    (verified in the plan), lineitem⨝orders shuffles once on orderkey."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join; every dimension broadcast, fact shuffles only for the agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
    )


@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k per key with a total order (ties broken by key)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (batch form of the streaming rollup)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis
# ---------------------------------------------------------------------------

# DuckDB needs the 'g' flag for global regexp_replace (Spark is global by default)
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOPS_SQL = "['the','a','an','and','or','of','to','in','is','it','that','for']"


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len({_TOKS_SQL}) AS n_tokens,
           CAST(ceil(length(text) / 4) AS BIGINT) AS bpe_tokens,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / greatest(length(text), 1), 6) AS punct_ratio,
           round(len(list_filter(list_transform({_TOKS_SQL}, x -> lower(x)),
                                 x -> list_contains({_STOPS_SQL}, x)))
                 / greatest(len({_TOKS_SQL}), 1), 6) AS stopword_ratio,
           round(0.4 * least(len({_TOKS_SQL}) / 100.0, 1.0)
               + 0.3 * least((len(list_filter(list_transform({_TOKS_SQL}, x -> lower(x)),
                                              x -> list_contains({_STOPS_SQL}, x)))
                              / greatest(len({_TOKS_SQL}), 1)) * 4.0, 1.0)
               + 0.3 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                     / greatest(length(text), 1)) * 5.0, 1.0)), 6) AS quality
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring over documents: length/stopword/punctuation signals
    combined into a C4/Gopher-style [0,1] score — all codegen expressions."""
    from cassandra_util_spark.operators.text import (
        bpe_token_estimate,
        punct_ratio,
        quality_score,
        stopword_ratio,
        whitespace_token_count,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        whitespace_token_count(t).cast("bigint").alias("n_tokens"),
        bpe_token_estimate(t).alias("bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
    )


@query(
    "lang_id",
    oracle=f"""
    SELECT doc_id,
      CASE
        WHEN en + de + fr + es = 0 THEN 'und'
        WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        WHEN de >= fr AND de >= es THEN 'de'
        WHEN fr >= es THEN 'fr'
        ELSE 'es'
      END AS lang_pred
    FROM (
      SELECT doc_id,
        len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS en,
        len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS de,
        len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une'], x))) AS fr,
        len(list_filter(toks, x -> list_contains(['el','los','las','y','es','una'], x))) AS es
      FROM (SELECT doc_id, list_transform({_TOKS_SQL}, x -> lower(x)) AS toks FROM documents)
    )
    """,
)
def lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (argmax with fixed precedence)."""
    from cassandra_util_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


@query(
    "doc_fingerprint",
    oracle=f"SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased, de-punctuated,
    space-collapsed text) — the formatting-insensitive dedup key."""
    from cassandra_util_spark.operators.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Training-data pipeline: deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle="""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM all_docs
    ) WHERE rn = 1
    """,
)
def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a sha256 digest, lowest id survives.
    The corpus is unioned with an exact copy (shifted ids) to exercise the
    collapse; survivors are precisely the original ids."""
    from cassandra_util_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return exact_dedup(d.unionByName(dup), "doc_id", ["text"]).select("doc_id")


@query(
    "dedup_fingerprint",
    oracle=f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, upper(text) || ' !!!' AS text FROM documents
    )
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
      FROM all_docs
    ) WHERE rn = 1
    """,
)
def dedup_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting-insensitive dedup: the corpus unioned with shouting-case,
    punctuated variants still collapses to the original ids via the
    normalized fingerprint."""
    from cassandra_util_spark.operators.text import fingerprint
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    variant = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit(" !!!")).alias("text"),
    )
    alld = d.unionByName(variant).withColumn("fp", fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    return (
        alld.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
    """,
)
def dedup_ngram_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs at threshold 0.5 (the planted
    near-duplicates in the corpus sit at >= 0.8; unrelated pairs < 0.2)."""
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


@query(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
    capped AS (
      SELECT s.doc_id, s.sh FROM sh s JOIN freq f ON f.sh = s.sh
      WHERE f.df > 1 AND f.df <= 20),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
    """,
)
def dedup_ngram_jaccard_capped_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB Jaccard mode: stop-shingles above doc-frequency 20 are
    dropped BEFORE candidate generation, bounding each shingle's pair
    fan-out at C(20,2) — the knob that keeps the self-join near-linear on
    web-scale corpora.  The cap is exact and portable (a deterministic
    doc-frequency filter), so this path gets the same full-hash oracle as
    the uncapped query: intersections count only capped shingles while
    set sizes stay uncapped, on both sides."""
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=20)


def _minhash_params_sql(num_perm: int = 64) -> str:
    """The (j, a, b) universal-hash family as a VALUES table — generated from
    the SAME ``minhash_params`` the Spark operator uses."""
    from cassandra_util_spark.operators.dedup import minhash_params

    rows = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(minhash_params(num_perm)))
    return f"(VALUES {rows}) p(j, a, b)"


def _p31(expr: str) -> str:
    from cassandra_util_spark.functions import portable_hash31_sql

    return portable_hash31_sql(expr)


def _p32(expr: str, offset: int) -> str:
    from cassandra_util_spark.functions import portable_hash32_sql

    return portable_hash32_sql(expr, offset)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    h AS (SELECT doc_id, {_p31('sh')} AS h FROM sh),
    sig AS (
      SELECT doc_id, p.j, min((p.a * h.h + p.b) % 2147483647) AS v
      FROM h CROSS JOIN {_minhash_params_sql(64)}
      GROUP BY doc_id, p.j),
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS bucket
      FROM sig GROUP BY doc_id, j // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    m AS (
      SELECT c.id_a, c.id_b, count(*) FILTER (WHERE sa.v = sb.v) AS matches
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b AND sb.j = sa.j
      GROUP BY 1, 2)
    SELECT id_a, id_b, round(matches / 64.0, 6) AS est_jaccard
    FROM m WHERE round(matches / 64.0, 6) >= 0.5
    """,
)
def dedup_minhash_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup pairs at estimated-jaccard 0.5.
    Portable md5-word base hash => the oracle reproduces the signatures,
    banding, candidate set, and estimate bit-for-bit; recall vs exact
    Jaccard is separately property-tested in test_pipeline_ops."""
    from cassandra_util_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.5)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents),
    hh AS (
      SELECT doc_id, {_p32('t', 1)} AS hi, {_p32('t', 9)} AS lo FROM toks),
    bits AS (
      SELECT doc_id, b.i AS i,
             sum(CASE WHEN ((CASE WHEN b.i < 32 THEN lo >> b.i
                                  ELSE hi >> (b.i - 32) END) & 1) = 1
                      THEN 1 ELSE -1 END) AS s
      FROM hh CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b
      GROUP BY doc_id, b.i),
    chunks AS (
      SELECT doc_id, i // 16 AS c,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << (i % 16)) ELSE 0 END) AS val
      FROM bits GROUP BY doc_id, i // 16),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             sum(bit_count(xor(a.val, b.val))) AS hamming
      FROM chunks a JOIN chunks b ON a.c = b.c AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= 3
    """,
)
def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 near-dup pairs at Hamming distance <= 3 via 4x16-bit band
    candidates (pigeonhole exact for d<=3).  The oracle computes ALL-pairs
    Hamming from the same portable per-bit md5 hashes — an equivalent (and
    simpler) formulation precisely BECAUSE the banding is exact for d<=3;
    the outputs must be identical, which is what the hash check certifies."""
    from cassandra_util_spark.operators.dedup import simhash_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3)


# ---------------------------------------------------------------------------
# Training-data pipeline: embedding similarity
# ---------------------------------------------------------------------------

@query(
    "embedding_neardup",
    oracle="""
    WITH all_vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE)) FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
    FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.99
    """,
)
def embedding_neardup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup pairs at 0.99 over the corpus unioned with exact
    copies (natural max cosine in the data is ~0.51, so survivors are exactly
    the planted copy pairs).  Uses the sign-LSH candidate path — identical
    vectors always share a bucket, so recall here is exact."""
    from cassandra_util_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = e.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    both = e.unionByName(copies)
    return embedding_neardup_pairs(both, "vec_id", "embedding", threshold=0.99, dim=64, planes=8)


@query(
    "embedding_dedup_resolve",
    oracle="""
    WITH RECURSIVE
    all_vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE)) FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.99),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(root) AS comp FROM reach GROUP BY id)
    SELECT av.vec_id,
           coalesce(c.comp, av.vec_id) AS cluster,
           av.vec_id = coalesce(c.comp, av.vec_id) AS keep
    FROM all_vecs av LEFT JOIN comp c ON c.id = av.vec_id
    """,
)
def embedding_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-space dedup pipeline end to end: sign-LSH cosine pairs
    at 0.99 (over the corpus + planted exact copies) closed into clusters by
    the same connected-components operator used for text near-dup, with one
    lowest-id survivor each — demonstrating that pair generators and
    cluster resolution compose across modalities.  Hash-verified including
    the closure (recursive CTE oracle)."""
    from cassandra_util_spark.operators.cluster import resolve_duplicates
    from cassandra_util_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = e.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    both = e.unionByName(copies)
    pairs = embedding_neardup_pairs(both, "vec_id", "embedding", threshold=0.99, dim=64, planes=8)
    return resolve_duplicates(both, pairs, "vec_id")


@query(
    "embedding_quantize",
    oracle="""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    scaled AS (
      SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM base)
    SELECT vec_id,
           CAST(unnest(range(0, len(v))) AS INT) AS pos,
           unnest(list_transform(v, x -> CAST(CASE WHEN m = 0 THEN 0
                  ELSE round(x * 127 / m) END AS INT))) AS qval,
           round(m / 127, 9) AS scale
    FROM scaled
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric quantization of every corpus vector, exported
    component-wise (vec_id, pos, qval, scale) so each of the 64·N integer
    codes and every per-vector scale is hash-verified.  This is the ANN
    memory lever at 100 TB (4× corpus per heap byte); recall impact is
    bounded and tested (quantized top-10 vs exact top-10)."""
    from cassandra_util_spark.operators.similarity import quantize_embedding

    e = _t(spark, sf_dir, "embeddings")
    qs = quantize_embedding(F.col("embedding"))
    return (
        e.select("vec_id", qs.alias("qs"))
        .select("vec_id", F.col("qs.q").alias("q"), F.col("qs.scale").alias("scale"))
        .select("vec_id", F.posexplode("q").alias("pos", "qval"), "scale")
    )


@query(
    "ann_cosine_topk",
    oracle="""
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(
                          list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(c.embedding, x -> CAST(x AS DOUBLE))) DESC,
                        c.vec_id ASC) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ) WHERE rank <= 10
    """,
)
def ann_cosine_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors — the exact ANN
    baseline (queries broadcast; corpus streams map-side)."""
    from cassandra_util_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk(e, e.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=10)


@query(
    "ann_ivf_topk",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 16),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(CASE WHEN isnan(list_cosine_similarity(c.v, s.cv))
                                     THEN 0 ELSE list_cosine_similarity(c.v, s.cv)
                                END, 4) DESC, s.cell ASC) AS rn
        FROM corpus c CROSS JOIN seeds s) WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 5),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, s.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, s.cv) DESC, s.cell ASC) AS rn
        FROM queries q CROSS JOIN seeds s) WHERE rn <= 4)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(p.qv, a.v) DESC, a.vec_id ASC) AS BIGINT) AS rank
      FROM probes p JOIN assigned a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id)
    WHERE rank <= 10
    """,
)
def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: corpus assigned to its nearest of K=16
    deterministic seed centroids once, queries probe the 4 nearest cells —
    the 100 TB scan pattern (scan N*nprobe/K instead of N).  refine_iters=0
    here so the oracle can replicate the centroid argmax exactly in SQL; the
    Lloyd-refined path is recall-tested in test_pipeline_ops."""
    from cassandra_util_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e, e.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        k=10, num_centroids=16, nprobe=4, refine_iters=0,
    )


@query(
    "semantic_dedup",
    oracle="""
    WITH RECURSIVE
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 16),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(CASE WHEN isnan(list_cosine_similarity(c.v, s.cv))
                                     THEN 0 ELSE list_cosine_similarity(c.v, s.cv)
                                END, 4) DESC, s.cell ASC) AS rn
        FROM corpus c CROSS JOIN seeds s) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(root) AS comp FROM reach GROUP BY id)
    SELECT c.vec_id,
           coalesce(cm.comp, c.vec_id) AS cluster,
           c.vec_id = coalesce(cm.comp, c.vec_id) AS keep
    FROM corpus c LEFT JOIN comp cm ON cm.id = c.vec_id
    """,
)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication end to end: k-means cells (K=16
    deterministic seeds; refine_iters=0 so the oracle replicates the argmax
    assignment in SQL — the Lloyd-refined path is recall-tested in pytest),
    cosine pairs computed ONLY within each cell (the cluster-scoping that
    makes semantic dedup tractable at web scale), transitive closure, one
    canonical survivor per semantic group.  threshold=0.4 sits below the
    corpus's natural max cosine (~0.51) so real semantic neighbors — not
    just planted copies — form the groups being verified."""
    from cassandra_util_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", num_centroids=16, threshold=0.4, refine_iters=0
    )


# ---------------------------------------------------------------------------
# Remaining SURVEY §2 surfaces: general joins, sessions, rollups, set ops
# ---------------------------------------------------------------------------

@query(
    "retention_rules_antijoin",
    oracle="""
    SELECT o_orderkey FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM (VALUES (1, 30), (80, 95), (120, 121)) AS r(lo, hi)
      WHERE o.o_custkey >= r.lo AND o.o_custkey <= r.hi
    )
    """,
)
def retention_rules_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERAL form of rules ⨝ data: a broadcast range-theta LEFT ANTI
    join (match ⇒ delete).  Equivalent to the compiled-literal predicate the
    convictors use, but rules stay a DataFrame — the shape to use when the
    rule table is too large to inline as literals (SURVEY §2.3)."""
    o = _t(spark, sf_dir, "orders")
    rules = spark.createDataFrame([(1, 30), (80, 95), (120, 121)], "lo bigint, hi bigint")
    cond = (F.col("o_custkey") >= F.col("lo")) & (F.col("o_custkey") <= F.col("hi"))
    return o.join(F.broadcast(rules), cond, "left_anti").select("o_orderkey")


@query(
    "events_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    m AS (
      SELECT user_id, event_id, ts, tus,
             CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM e),
    s AS (
      SELECT user_id, tus,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)  -- total tie order (ts, event_id) keeps equal-ts rows in one session
    SELECT user_id, CAST(min(tus) // 1000000 AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — the stateful
    streaming concept in batch form; the oracle is the classic
    gaps-and-islands formulation."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


@query(
    "orders_status_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def orders_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (status → priority → grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@query(
    "set_ops_except_intersect",
    oracle="""
    SELECT o_custkey, 'both_years' AS tag FROM (
      SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
    UNION ALL
    SELECT o_custkey, 'early_only' AS tag FROM (
      SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
    """,
)
def set_ops_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION surface (the reference only ever unions
    scanner streams; these arrive free with Spark — SURVEY §2.6)."""
    o = _t(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= "1997-01-01").select("o_custkey")
    both = early.intersect(late).withColumn("tag", F.lit("both_years"))
    only_early = early.subtract(late).withColumn("tag", F.lit("early_only"))  # EXCEPT DISTINCT
    return both.unionByName(only_early)


@query(
    "paged_fetch",
    oracle="SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 100",
)
def paged_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paged-fetch analog (fetchSize / mapPrefetch): deterministic
    keyset-ordered page; in Spark paging is a limit over a sorted scan, and
    prefetch is the vectorized reader's pipelining (SURVEY §2.1)."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").limit(100).select("o_orderkey", "o_custkey")


@query(
    "retention_ttl_mixed_keys",
    oracle=f"""
    SELECT event_id FROM events
    WHERE NOT COALESCE(
      (CASE WHEN user_id >= 0 AND user_id <= 99 AND event_id % 5 = 0 THEN 604800
            WHEN user_id >= 100 AND user_id <= 120 THEN 1209600
            ELSE NULL END) >= 0
      AND (({TTL_NOW_MS} - epoch_us(ts) // 1000) // 1000) >
          (CASE WHEN user_id >= 0 AND user_id <= 99 AND event_id % 5 = 0 THEN 604800
                WHEN user_id >= 100 AND user_id <= 120 THEN 1209600
                ELSE NULL END)
    , FALSE)  -- three-valued logic: unmatched rows (NULL ttl) must KEEP
    """,
)
def retention_ttl_mixed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL rules mixing partition- AND clustering-key columns — legal for the
    TTL convictor (the partition pass collects candidate rules, the cluster
    pass refines; full-AND semantics in the DataFrame model).  The mixed-key
    rule uses a derived ck column (event_id bucket) to exercise typed bounds
    on both key levels.  No default TTL: unmatched rows keep forever."""
    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .withColumn("ebucket", F.pmod(F.col("event_id"), F.lit(5)))
    )
    table = KeyedTable(ev, TableMeta(("user_id",), ("event_id", "ebucket"), "writetime"), "events")
    rules = [
        Rule(
            "weekly_bucket0",
            {"user_id": (Range("0", "99"),), "ebucket": (Range("0", "0"),)},
            ttl=604_800,  # 7 d for bucket-0 events of regular users
        ),
        Rule("two_weeks_vips", {"user_id": (Range("100", "120"),)}, ttl=1_209_600),
    ]
    conv = RuleBasedLateTTLConvictor(table, rules=rules, now_ms=TTL_NOW_MS)
    return ev.filter(conv.keep_expr()).select("event_id")


@query(
    "asof_join_clicks_purchases",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, ts, max(event_id) AS pev
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id, p.pev AS purchase_event_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_wt
    FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark's API lacks; DuckDB ASOF JOIN is the
    oracle): each click paired with the user's latest at-or-before purchase.
    Right side deduped per (user, ts) first so tie semantics are defined in
    both engines."""
    from cassandra_util_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("pev"))
    )
    joined = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts", right_cols=["pev"]
    )
    return joined.select(
        "event_id",
        F.col("pev_right").alias("purchase_event_id"),
        writetime_micros(F.col("ts_right")).alias("purchase_wt"),
    )


@query(
    "range_join_incidents",
    oracle="""
    WITH incidents AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS lo,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) + 3599 AS hi
      FROM events WHERE event_type = 'error'
      GROUP BY 1, 2 HAVING count(*) >= 3),
    purchases AS (
      SELECT event_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS p
      FROM events WHERE event_type = 'purchase')
    SELECT pu.event_id, i.lo AS incident_start
    FROM purchases pu JOIN incidents i ON pu.p >= i.lo AND pu.p <= i.hi
    """,
)
def range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (no equi-key): purchases falling inside error-
    burst hours.  A naive inequality join is O(points x intervals) nested
    loop; bucketing the time domain turns it into one equi-shuffle."""
    from cassandra_util_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("lo"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("lo", (F.col("lo") + 3599).alias("hi"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", (writetime_micros(F.col("ts")) / 1_000_000).cast("bigint").alias("p")
    )
    joined = range_join(purchases, incidents, "p", "lo", "hi", bucket_width=3600)
    return joined.select("event_id", F.col("lo").alias("incident_start"))


# ---------------------------------------------------------------------------
# Analytics breadth: returned-item report, scalar subquery, profiling
# ---------------------------------------------------------------------------

@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue per customer (TPC-H Q10 shape)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
    )


@query(
    "parts_above_avg_price",
    oracle="""
    SELECT p_partkey FROM part
    WHERE CAST(p_retailprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM part)
        > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,2))) FROM part)
    """,
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery surface: parts priced above the mean, compared as
    price*count > sum so the arithmetic stays exact (no float average)."""
    p = _t(spark, sf_dir, "part")
    p.createOrReplaceTempView("part_sq")
    return spark.sql(
        """
        SELECT p_partkey FROM part_sq
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM part_sq)
            > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,2))) FROM part_sq)
        """
    )


@query(
    "orders_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_prices
    FROM orders
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-profiling surface for pipeline data quality: cardinalities,
    ranges, exact distincts, null counts — one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).cast("bigint").alias("null_prices"),
    )


@query(
    "token_count_regex",
    oracle=f"""
    SELECT doc_id,
           {_REGEX_TOKS_SQL} AS n_regex_tokens
    FROM documents
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: alpha runs, digit runs, and lone symbols
    each count as one token (the pre-tokenizer shape BPE vocabularies use)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", _tokcount(F.col("text")).alias("n_regex_tokens"))


# ---------------------------------------------------------------------------
# Analytics breadth: semi-join, pushdown range agg, pivot, lead/lag, percentiles
# ---------------------------------------------------------------------------

@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelated to a LEFT SEMI join (TPC-H Q4 shape): the probe
    side streams, the semi side deduplicates on the join key — no row
    multiplication, one shuffle on the order key."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sem = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-aggregate with range predicates (TPC-H Q6 shape): every
    filter reaches the parquet scan as a pushed filter + min/max row-group
    prune; the aggregation is a map-side partial — zero shuffled rows beyond
    one partial-agg row per task."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return f.agg(
        F.sum(price * disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "orders_pivot_priority",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def orders_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status x priority counts).  The pivot values are DECLARED, not
    discovered: passing them up front removes the extra distinct-values job
    Spark otherwise runs — the difference between one pass and two at scale."""
    o = _t(spark, sf_dir, "orders")
    piv = o.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).count()
    renames = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(a)
          for p, a in zip(_PRIORITIES, renames)],
    )


@query(
    "events_user_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM g GROUP BY user_id
    """,
)
def events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user via lag() — the lead/lag analytic
    surface.  One shuffle on user_id serves BOTH the window sort and the
    aggregation (same key, exchange reuse).  (ts, event_id) is a total order,
    so gaps are deterministic under equal timestamps.  The gap total is an
    exact bigint sum — an engine-portable avg falls out as sum/n downstream
    (cross-engine double division rounds differently at the 6dp boundary)."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "gap_us", writetime_micros(F.col("ts")) - F.lag(writetime_micros(F.col("ts"))).over(w)
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
    )


@query(
    "acctbal_percentiles",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(quantile_cont(c_acctbal, 0.5), 6) AS p50_acctbal,
           ROUND(quantile_cont(c_acctbal, 0.95), 6) AS p95_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per segment (sort-based aggregate).
    Both engines use the (n-1)*p linear-interpolation definition.  At scale
    swap for approx_percentile: the exact form concentrates each group on one
    task; the sketch is mergeable map-side."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("p50_acctbal"),
        F.round(F.expr("percentile(c_acctbal, 0.95)"), 6).alias("p95_acctbal"),
    )


# ---------------------------------------------------------------------------
# Multimodal: binary payload pipeline (decode step stubbed, plumbing real)
# ---------------------------------------------------------------------------

@query(
    "media_features",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest,
           CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) AS f0_byte
    FROM documents
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas: docs
    become opaque media blobs, the (stubbed-deterministic) decoder emits
    n_bytes / sha256 digest / an 8-dim feature.  The first feature element is
    exported through an exact integer roundtrip (f*255 is the digest's first
    byte), so the oracle verifies the decode chain bit-for-bit — float32
    storage cannot drift a value that must land on an integer."""
    from cassandra_util_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    d = _t(spark, sf_dir, "documents")
    feats = extract_features(media_from_documents(d), decoder="fake", dim=8)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "digest",
        F.round(F.element_at("feature", 1).cast("double") * 255, 0)
        .cast("int")
        .alias("f0_byte"),
    )


@query(
    "media_dedup",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, sha256(text) AS d FROM documents
      UNION ALL
      SELECT doc_id + 1000000, sha256(text) FROM documents)
    SELECT media_id FROM (
      SELECT media_id, row_number() OVER (PARTITION BY d ORDER BY media_id) AS rn
      FROM media) WHERE rn = 1
    """,
)
def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over opaque BINARY payloads: the media table unioned
    with byte-identical copies collapses back to the originals.  The
    shuffle key is the 32-byte digest of the raw bytes — payloads are
    hashed byte-exact (never cast through string, which is a lossy UTF-8
    decode) and never enter a shuffle.  At 100 TB this is THE media dedup
    plan: one digest scan + one 32-byte-key shuffle, blobs stay put."""
    from cassandra_util_spark.operators.dedup import exact_dedup
    from cassandra_util_spark.operators.multimodal import media_from_documents

    m = media_from_documents(_t(spark, sf_dir, "documents")).select("media_id", "payload")
    copies = m.select((F.col("media_id") + 1000000).alias("media_id"), "payload")
    return exact_dedup(m.unionByName(copies), "media_id", ["payload"]).select("media_id")


@query(
    "media_frame_plan",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, greatest(n_chars % 120, 1), 10)) AS BIGINT) AS frame_ts
    FROM documents
    """,
)
def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: metadata-driven fan-out from media rows to
    (media_id, frame_ts) rows — the shuffle-free explode a real frame decoder
    consumes.  Synthetic duration = n_chars % 120 seconds, sampled at 10s."""
    from cassandra_util_spark.operators.multimodal import (
        frame_sample_plan,
        media_from_documents,
    )

    d = _t(spark, sf_dir, "documents")
    # media_from_documents drops n_chars; attach the synthetic duration from
    # the source table (broadcast-sized key join, payloads never shuffle)
    media = media_from_documents(d, kind="video").join(
        d.select(F.col("doc_id").alias("media_id"), (F.col("n_chars") % 120).alias("__dur")),
        "media_id",
    ).withColumn(
        "meta", F.create_map(F.lit("duration_s"), F.col("__dur").cast("string"))
    )
    return frame_sample_plan(media, every_n_seconds=10).select(
        "media_id", F.col("frame_ts").cast("bigint").alias("frame_ts")
    )


@query(
    "events_json_props",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation (the schema-on-read surface for
    semi-structured event payloads).  `get_json_object` evaluates JVM-side in
    codegen; for hot paths with a KNOWN schema prefer `from_json` once into a
    struct column — parse once, not per-expression."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("bigint").alias("k_sum"),
        )
    )


@query(
    "salted_event_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def salted_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation in the contract: identical results to the
    direct groupBy (DECIMAL sums are associative across the salt split), but
    a key owning half the table spreads over 32 reducers in phase 1 instead
    of landing on one."""
    from cassandra_util_spark.functions.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    return salted_agg(
        ev,
        ["event_type"],
        {"n": F.count(F.lit(1)), "value_sum": F.sum(F.col("value").cast("decimal(28,6)"))},
        {"n": F.sum("n").cast("bigint"), "value_sum": F.sum("value_sum").cast("double")},
    )


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY o_custkey
    """,
)
def bucketed_colocated_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-aware co-location as bucketed storage: both sides written
    bucketBy(8, custkey) — the equi-join then needs NO shuffle exchange
    under either side, and the downstream per-custkey aggregate reuses the
    same partitioning (zero Exchange in the whole plan; the batch analog of
    CQLBatch.groupByFirstReplica locality).  The oracle is the plain join —
    bucketing must change the plan, never the result."""
    import os
    import tempfile

    from cassandra_util_spark.sources.bucketed import colocated_join, write_bucketed

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="bucketed-contract-")
    write_bucketed(c, "bk_customer", ["custkey"], 8, sort_cols=["custkey"],
                   path=os.path.join(base, "customer"))
    write_bucketed(o, "bk_orders", ["custkey"], 8, sort_cols=["custkey"],
                   path=os.path.join(base, "orders"))
    joined = colocated_join(spark, "bk_customer", "bk_orders", ["custkey"])
    return joined.groupBy("custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
    )


@query(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             round(0.4 * least(len({_TOKS_SQL}) / 100.0, 1.0)
                 + 0.3 * least((len(list_filter(list_transform({_TOKS_SQL}, x -> lower(x)),
                                                x -> list_contains({_STOPS_SQL}, x)))
                                / greatest(len({_TOKS_SQL}), 1)) * 4.0, 1.0)
                 + 0.3 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                       / greatest(length(text), 1)) * 5.0, 1.0)), 6) AS quality,
             CASE
               WHEN en + de + fr + es = 0 THEN 'und'
               WHEN en >= de AND en >= fr AND en >= es THEN 'en'
               WHEN de >= fr AND de >= es THEN 'de'
               WHEN fr >= es THEN 'fr'
               ELSE 'es'
             END AS lang_pred
      FROM (
        SELECT doc_id, text,
          len(list_filter(ltoks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS en,
          len(list_filter(ltoks, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS de,
          len(list_filter(ltoks, x -> list_contains(['le','la','les','et','est','une'], x))) AS fr,
          len(list_filter(ltoks, x -> list_contains(['el','los','las','y','es','una'], x))) AS es
        FROM (SELECT doc_id, text, list_transform({_TOKS_SQL}, x -> lower(x)) AS ltoks
              FROM documents)
      )),
    filtered AS (
      SELECT doc_id, text, quality, lang_pred FROM scored
      WHERE quality >= 0.5 AND lang_pred = 'en'),
    deduped AS (
      SELECT doc_id, lang_pred, quality,
             row_number() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
      FROM filtered)
    SELECT doc_id, lang_pred, quality FROM deduped WHERE rn = 1
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pipeline in ONE Catalyst plan:
    quality scoring -> language filter -> formatting-insensitive dedup
    (fingerprint, lowest id survives).  Composition is the point: scoring and
    language ID fuse into the same map-only scan stage (whole-stage codegen),
    the quality/lang filter prunes BEFORE the dedup shuffle, and the only
    exchange in the plan is on the 16-byte fingerprint of the surviving
    rows — exactly how the stages compose at 100 TB."""
    from pyspark.sql import Window
    from cassandra_util_spark.operators.text import fingerprint, lang_id, quality_score

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id", "text",
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
    )
    filtered = scored.filter((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy(F.col("doc_id").asc())
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_pred", "quality")
    )


@query(
    "decontamination",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    grams AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM toks WHERE len(w) >= 5)
    ),
    bench AS (SELECT DISTINCT sh FROM grams WHERE doc_id % 50 = 0),
    hits AS (
      SELECT g.doc_id, count(*) AS n_collisions
      FROM grams g JOIN bench b ON g.sh = b.sh
      WHERE g.doc_id % 50 <> 0
      GROUP BY g.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(h.n_collisions, 0) AS BIGINT) AS n_collisions,
           coalesce(h.n_collisions, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 50 <> 0
    """,
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: every training doc (doc_id % 50 != 0) is
    checked for 5-gram overlap against the held-out benchmark slice
    (doc_id % 50 == 0).  The benchmark gram set broadcasts, so the 100 TB
    training scan stays join-local; the only shuffle is the per-doc
    collision count.  Hash-verified per document, including zero-collision
    rows."""
    from cassandra_util_spark.operators.dedup import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(train, bench, "doc_id", "text", n=5, min_collisions=1)


# shared by dedup_clusters (label propagation) and dedup_clusters_star
# (large-star/small-star contraction): both algorithms must hash-match the
# same transitive-closure oracle
_CLUSTERS_CTE = f"""
    WITH RECURSIVE
    norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(root) AS comp FROM reach GROUP BY id)
    """

_CLUSTERS_ORACLE = f"""{_CLUSTERS_CTE}
    SELECT d.doc_id,
           coalesce(c.comp, d.doc_id) AS cluster,
           d.doc_id = coalesce(c.comp, d.doc_id) AS keep
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup resolution: Jaccard pairs (the same edges the
    dedup_ngram_jaccard query verifies) closed into connected components by
    iterative min-label propagation, then one canonical survivor (lowest id)
    per cluster across the WHOLE corpus — singletons are their own cluster.
    The oracle replays the closure as a recursive CTE, so the iterative
    DataFrame algorithm is hash-checked end to end, not just row-counted."""
    from cassandra_util_spark.operators.cluster import resolve_duplicates
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return resolve_duplicates(d, pairs, "doc_id")


@query("dedup_clusters_star", oracle=_CLUSTERS_ORACLE)
def dedup_clusters_star_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same transitive near-dup resolution as ``dedup_clusters``, closed by
    alternating large-star/small-star contraction (Kiveris et al., SoCC'14)
    instead of label propagation — the O(log² n)-round path for pair graphs
    whose components may chain (diameter ≫ LSH's shallow near-cliques).
    Hash-checked against the identical recursive-CTE oracle, so both
    algorithms are certified to produce the same clustering."""
    from cassandra_util_spark.operators.cluster import resolve_duplicates
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return resolve_duplicates(d, pairs, "doc_id", method="star")


# per-language sampling rates for the stratified-sample contract query;
# thresholds are integer literals computed ONCE here and inlined into BOTH
# engines' predicates, so there is no cross-engine float rounding surface
_STRATA_FRACTIONS = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.1, "zh": 0.3}


def _strata_case_sql() -> str:
    from cassandra_util_spark.operators.sampling import gate_threshold

    arms = " ".join(
        f"WHEN lang = '{v}' THEN {gate_threshold(f)}"
        for v, f in sorted(_STRATA_FRACTIONS.items())
    )
    return f"CASE {arms} ELSE 0 END"


@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substring(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < {_strata_case_sql()}
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling in ONE map-only pass: a row is
    kept iff a portable hash of (seed, doc_id) clears its language's
    threshold.  Unlike df.sample, the selected ROW SET is a pure function
    of the data — independent of partitioning, cluster size, and run order
    — which is what makes a 100 TB corpus sample reproducible and
    auditable (the oracle re-derives the exact membership)."""
    from cassandra_util_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_sample(d, "lang", _STRATA_FRACTIONS, "doc_id", seed="s1").select(
        "doc_id", "lang"
    )


@query(
    "stratified_topk_docs",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substring(md5('topk:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) ASC,
                        doc_id ASC) AS rn
      FROM documents) WHERE rn <= 25
    """,
)
def stratified_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 25 documents per language by hash order — the deterministic
    reservoir for quota-exact eval sets.  Unlike fraction gating (binomial
    counts), the quota is exact; unlike rand()-based sampling, membership
    survives repartitioning and is re-derivable by the oracle.  The window
    is WindowGroupLimit-pushed, so the stratum shuffle carries ~k rows per
    language."""
    from cassandra_util_spark.operators.sampling import stratified_topk_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_topk_sample(d, "lang", 25, "doc_id", seed="topk").select(
        "doc_id", "lang"
    )


# per-language multiplicities for the epoch-mixing contract query: scarce
# strata upweighted, 'en' downsampled, 'zh' dropped — fractional parts are
# realized through the integer hash gate, never engine-side float math
_REPEAT_MULTS = {"en": 0.6, "de": 2.3, "fr": 1.5, "zh": 0.0}


def _repeat_case_sql() -> tuple[str, str]:
    from cassandra_util_spark.operators.sampling import gate_threshold

    base_arms, thr_arms = [], []
    for v, m in sorted(_REPEAT_MULTS.items()):
        base_arms.append(f"WHEN lang = '{v}' THEN {int(m)}")
        thr_arms.append(f"WHEN lang = '{v}' THEN {gate_threshold(m - int(m))}")
    return (
        f"CASE {' '.join(base_arms)} ELSE 1 END",
        f"CASE {' '.join(thr_arms)} ELSE 0 END",
    )


_REPEAT_BASE_SQL, _REPEAT_THR_SQL = _repeat_case_sql()


@query(
    "weighted_repeat_docs",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang,
             {_REPEAT_BASE_SQL} + (CASE WHEN
               CAST(('0x' || substring(md5('rep:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               < {_REPEAT_THR_SQL} THEN 1 ELSE 0 END) AS n
      FROM documents)
    SELECT doc_id, lang, unnest(range(1, n + 1)) AS copy
    FROM m WHERE n >= 1
    """,
)
def weighted_repeat_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch mixing by fractional repetition: 'de' docs appear 2x (plus an
    exact hash-gated 30% a third time), 'fr' 1.5x, 'en' downsampled to a
    0.6 keep rate, 'zh' dropped.  Multiplicity is realized per row by a
    map-side explode over an integer copy sequence — no shuffle, no RNG —
    and the oracle re-derives every (doc, copy) pair from the same integer
    thresholds."""
    from cassandra_util_spark.operators.sampling import stratified_repeat

    d = _t(spark, sf_dir, "documents")
    return stratified_repeat(d, "lang", _REPEAT_MULTS, "doc_id", seed="rep").select(
        "doc_id", "lang", "copy"
    )


@query(
    "corpus_lang_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text,
             CAST(ceil(length(text) / 4) AS BIGINT) AS bpe,
             string_split({_NORM_SQL}, ' ') AS w
      FROM documents),
    scored AS (
      SELECT lang, bpe,
        round(0.4 * least(len({_TOKS_SQL}) / 100.0, 1.0)
            + 0.3 * least((len(list_filter(list_transform({_TOKS_SQL}, x -> lower(x)),
                                           x -> list_contains({_STOPS_SQL}, x)))
                           / greatest(len({_TOKS_SQL}), 1)) * 4.0, 1.0)
            + 0.3 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                  / greatest(length(text), 1)) * 5.0, 1.0)), 6) AS quality,
        CASE WHEN round(CASE WHEN len(w) > 0 THEN
               list_max(list_transform(list_distinct(w), t -> len(list_filter(w, x -> x = t)))) / len(w)
               ELSE 0.0 END, 6) > 0.12
          OR round(CASE WHEN len(w) >= 2 THEN
               1.0 - len(list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])))
                     / (len(w) - 1)
               ELSE 0.0 END, 6) > 0.06
        THEN 1 ELSE 0 END AS rep
      FROM toks)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(bpe) AS BIGINT) AS total_tokens,
           round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_quality,
           round(CAST(sum(rep) AS BIGINT) / count(*), 6) AS pct_repetitive
    FROM scored GROUP BY lang
    """,
)
def corpus_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-health dashboard: per-language doc counts, token volume,
    mean quality, and repetitive-doc share — quality scoring, repetition
    signals, and token estimation fused into ONE map stage feeding one
    partial-aggregated groupBy shuffle.  Mean quality is summed in DECIMAL
    (float summation is partitioning-order-dependent) and divided once —
    the determinism discipline every aggregate here follows."""
    from cassandra_util_spark.operators.text import (
        bpe_token_estimate,
        duplicate_ngram_fraction,
        quality_score,
        top_token_fraction,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    rep = (
        (F.round(top_token_fraction(t), 6) > 0.12)
        | (F.round(duplicate_ngram_fraction(t, 2), 6) > 0.06)
    ).cast("int")
    per_doc = d.select(
        "lang",
        bpe_token_estimate(t).alias("bpe"),
        quality_score(t).alias("quality"),
        rep.alias("rep"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_quality"),
        F.round(F.sum("rep") / F.count(F.lit(1)), 6).alias("pct_repetitive"),
    )


@query(
    "doc_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    stats AS (
      SELECT doc_id,
        round(CASE WHEN len(w) > 0 THEN
          list_max(list_transform(list_distinct(w), t -> len(list_filter(w, x -> x = t)))) / len(w)
          ELSE 0.0 END, 6) AS top_token_frac,
        round(CASE WHEN len(w) >= 2 THEN
          1.0 - len(list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])))
                / (len(w) - 1)
          ELSE 0.0 END, 6) AS dup_bigram_frac
      FROM toks)
    SELECT doc_id, top_token_frac, dup_bigram_frac,
           (top_token_frac > 0.12 OR dup_bigram_frac > 0.06) AS repetitive
    FROM stats
    """,
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signals for every document —
    most-frequent-token fraction and duplicate-bigram fraction — plus the
    combined flag.  Both signals are pure expressions fused into one
    map-only codegen stage: at 100 TB this is a single scan reading
    (doc_id, text), no shuffle, no Python."""
    from cassandra_util_spark.operators.text import repetition_profile

    d = _t(spark, sf_dir, "documents")
    return repetition_profile(d, "doc_id", "text")


@query(
    "pii_redaction",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                  || CAST(doc_id % 100 AS VARCHAR)
                  || ' ssn 123-45-6789 tel +1 (555) 010-'
                  || CAST(1000 + doc_id % 9000 AS VARCHAR) AS t
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
             '\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g') AS clean
    FROM aug
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub certified end to end: every document gets deterministic
    synthetic PII appended (email, IPv4, SSN, phone derived from doc_id),
    then the redaction chain runs and the full cleaned TEXT is
    hash-compared against DuckDB applying the same patterns — proving the
    patterns fire, in order, identically, on all 500 docs.  Map-only."""
    from cassandra_util_spark.operators.text import redact_pii

    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"),
        F.lit(" ssn 123-45-6789 tel +1 (555) 010-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    return d.select("doc_id", redact_pii(aug).alias("clean"))


@query(
    "sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, CAST(ceil(length(text) / 4) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
      FROM t)
    SELECT doc_id, n_tokens,
           cum_before // 1024 AS bin,
           cum_before % 1024 AS bin_offset
    FROM c
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 1024-token training windows,
    in doc_id order: each document's window and in-window offset derive
    from the running token count — hash-verified against the same window
    arithmetic in DuckDB.  The contract runs the single-stream (global
    order) mode; pack_sequences(shard_col=...) is the per-shard parallel
    form used at scale, and pack_greedy is the no-split applyInPandas
    variant (both pytest-verified)."""
    from cassandra_util_spark.operators.packing import pack_sequences
    from cassandra_util_spark.operators.text import bpe_token_estimate

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", bpe_token_estimate(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(d, "doc_id", "n_tokens", capacity=1024)


@query(
    "doc_chunks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    sized AS (
      SELECT doc_id, w,
             greatest(CAST(ceil((len(w) - 16) / 48.0) AS BIGINT), 1) AS k
      FROM toks)
    SELECT doc_id,
           CAST(unnest(range(0, k)) AS INT) AS chunk_id,
           unnest(list_transform(range(0, k),
             i -> array_to_string(list_slice(w, i * 48 + 1, i * 48 + 64), ' '))) AS chunk_text,
           unnest(list_transform(range(0, k),
             i -> least(64, len(w) - i * 48))) AS n_words
    FROM sized
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-word windows (stride 48, overlap 16) for every
    document — the segmentation feeding fixed-context training and
    retrieval indexing.  Map-only expression fan-out; chunk ids, texts,
    and word counts hash-verified row-for-row against the same window
    arithmetic in DuckDB."""
    from cassandra_util_spark.operators.packing import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_words=64, overlap=16)


@query(
    "doc_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
            FROM documents)
      WHERE term <> ''
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ((SELECT count(*) FROM documents) - dfreq.df + 0.5)
                   / (dfreq.df + 0.5), 6) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term),
    ranked AS (
      SELECT doc_id, term, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term ASC) AS INT) AS rank
      FROM scored)
    SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3
    """,
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·idf with a rational
    (log-free) idf — small-integer double arithmetic is IEEE-exact, so the
    scores AND the rank order hash-match the oracle bit for bit, which a
    libm-log idf cannot guarantee at tie boundaries.  Total tiebreak on
    the term makes the top-k deterministic."""
    from cassandra_util_spark.operators.text import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, "doc_id", "text", k=3)


@query(
    "doc_commonness",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
            FROM documents)
      WHERE term <> ''
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(SUM(tf.tf * dfreq.df)
                 / (SUM(tf.tf) * (SELECT count(*) FROM documents)), 6) AS commonness
    FROM tf JOIN dfreq ON tf.term = dfreq.term
    GROUP BY tf.doc_id
    """,
)
def doc_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-commonness quality signal — the exactly-reproducible surrogate
    for an LM-perplexity filter (CCNet's KenLM gate): per document, the
    tf-weighted mean document-frequency ratio of its tokens.  Numerator and
    denominator are integer aggregates with ONE final rounded division, so
    the score hash-matches across engines where a mean of log-probabilities
    (libm ulp + float summation order) could not."""
    from cassandra_util_spark.operators.text import commonness_score

    d = _t(spark, sf_dir, "documents")
    return commonness_score(d, "doc_id", "text")


# the full-assembly pipeline's redaction chain, identical to PII_PATTERNS
# (operators/text.py) — kept as one SQL fragment so the assembly oracle
# applies the exact same chain to the exact same column
_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,"
    " '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),"
    " '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),"
    " '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),"
    " '\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g')"
)


def _assembly_oracle() -> str:
    from cassandra_util_spark.operators.sampling import gate_threshold

    thr = gate_threshold(0.8)
    return f"""
    WITH RECURSIVE
    docs0 AS (SELECT doc_id, lang, {_REDACT_SQL} AS text FROM documents),
    scored AS (
      SELECT doc_id, text,
             round(0.4 * least(len({_TOKS_SQL}) / 100.0, 1.0)
                 + 0.3 * least((len(list_filter(list_transform({_TOKS_SQL}, x -> lower(x)),
                                                x -> list_contains({_STOPS_SQL}, x)))
                                / greatest(len({_TOKS_SQL}), 1)) * 4.0, 1.0)
                 + 0.3 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                       / greatest(length(text), 1)) * 5.0, 1.0)), 6) AS quality,
             CASE
               WHEN en + de + fr + es = 0 THEN 'und'
               WHEN en >= de AND en >= fr AND en >= es THEN 'en'
               WHEN de >= fr AND de >= es THEN 'de'
               WHEN fr >= es THEN 'fr'
               ELSE 'es'
             END AS lang_pred
      FROM (
        SELECT doc_id, text,
          len(list_filter(ltoks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS en,
          len(list_filter(ltoks, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS de,
          len(list_filter(ltoks, x -> list_contains(['le','la','les','et','est','une'], x))) AS fr,
          len(list_filter(ltoks, x -> list_contains(['el','los','las','y','es','una'], x))) AS es
        FROM (SELECT doc_id, text, list_transform({_TOKS_SQL}, x -> lower(x)) AS ltoks
              FROM docs0)
      )),
    filtered AS (
      SELECT doc_id, text FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'),
    dd AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
        FROM filtered) WHERE rn = 1),
    toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM dd),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
    capped AS (
      SELECT s.doc_id, s.sh FROM sh s JOIN freq f ON f.sh = s.sh
      WHERE f.df > 1 AND f.df <= 20),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(root) AS comp FROM reach GROUP BY id),
    survivors AS (
      SELECT d.doc_id, d.text FROM dd d LEFT JOIN comp c ON c.id = d.doc_id
      WHERE coalesce(c.comp, d.doc_id) = d.doc_id),
    sampled AS (
      SELECT doc_id, CAST(ceil(length(text) / 4) AS BIGINT) AS n_tokens
      FROM survivors
      WHERE CAST(('0x' || substring(md5('asm:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < {thr}),
    packed AS (
      SELECT doc_id, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
      FROM sampled)
    SELECT doc_id, n_tokens,
           cum_before // 512 AS bin,
           cum_before % 512 AS bin_offset
    FROM packed
    """


@query("training_corpus_assembly", oracle=_assembly_oracle())
def training_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-corpus assembly line as one declarative plan:
    PII redaction -> quality + language gate -> formatting-insensitive
    exact dedup -> transitive near-dup resolution (Jaccard pairs + connected
    components, canonical survivor) -> deterministic 0.8 sample -> packing
    into 512-token windows.  Every stage is an already-oracle-verified
    operator; this query certifies their COMPOSITION end to end with one
    hash.  Plan-wise: redaction/scoring/gating fuse into the first map
    stage, the dedup shuffle sees only gated survivors, pair generation
    (the CAPPED doc-frequency Jaccard — the mode that survives web scale)
    sees only deduped survivors, and the sample gate is applied before the
    packing window — each stage shrinks the data the next one shuffles,
    which is exactly the 100 TB assembly discipline.  At small SF the
    runtime is dominated by the component-closure rounds' fixed job
    latency, which amortizes as data grows."""
    from pyspark.sql import Window

    from cassandra_util_spark.operators.cluster import resolve_duplicates
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs
    from cassandra_util_spark.operators.packing import pack_sequences
    from cassandra_util_spark.operators.sampling import hash_sample
    from cassandra_util_spark.operators.text import (
        bpe_token_estimate,
        fingerprint,
        lang_id,
        quality_score,
        redact_pii,
    )

    d = _t(spark, sf_dir, "documents").withColumn("text", redact_pii(F.col("text")))
    t = F.col("text")
    gated = d.select("doc_id", "text", quality_score(t).alias("q"), lang_id(t).alias("l")).filter(
        (F.col("q") >= 0.5) & (F.col("l") == "en")
    )
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy(F.col("doc_id").asc())
    # materialize the dedup survivors once: three consumers follow (pair
    # generation, the resolve id-set, the survivor join) and each would
    # otherwise replay the scan+score+window subtree
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    pairs = ngram_jaccard_pairs(
        deduped, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=20
    )
    resolved = resolve_duplicates(deduped, pairs, "doc_id")
    survivors = deduped.join(
        resolved.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    # materialize the 2-column packing input once: the distributed prefix
    # sum makes three passes over it (boundary aggregate, bucket totals,
    # local window), and without this pin each pass would re-execute the
    # pair-generation/resolve chain above (~1.1 s measured at sf0.1)
    sampled = (
        hash_sample(survivors, 0.8, "doc_id", seed="asm")
        .select("doc_id", bpe_token_estimate(F.col("text")).alias("n_tokens"))
        .localCheckpoint(eager=False)
    )
    # distributed=True: bit-identical packing through the two-phase prefix
    # sum (functions/cumsum.py) instead of a single-task global window —
    # the flagship pipeline's last serialization point, removed r12
    return pack_sequences(
        sampled, "doc_id", "n_tokens", capacity=512, distributed=True
    )


@query(
    "dedup_incremental",
    oracle="""
    WITH ref AS (
      SELECT DISTINCT sha256(text) AS d FROM documents WHERE doc_id < 250),
    incoming AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200)
    SELECT i.doc_id FROM incoming i
    WHERE sha256(i.text) NOT IN (SELECT d FROM ref)
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-versus-historical-corpus dedup: the incoming slice
    (doc_id >= 200) anti-joins the historical store's digest set
    (doc_id < 250), dropping exactly the 50 overlapping documents.  The
    reference reduces to one 32-byte digest per historical doc — the
    persisted artifact an incremental crawl pipeline keeps — and the join
    shuffles digests, never content."""
    from cassandra_util_spark.operators.dedup import dedup_against

    d = _t(spark, sf_dir, "documents")
    reference = d.filter(F.col("doc_id") < 250)
    incoming = d.filter(F.col("doc_id") >= 200)
    return dedup_against(incoming, reference, "doc_id", ["text"]).select("doc_id")


@query(
    "dedup_incremental_bloom",
    oracle="""
    WITH ref AS (
      SELECT DISTINCT sha256(text) AS d FROM documents WHERE doc_id < 250),
    incoming AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200)
    SELECT i.doc_id FROM incoming i
    WHERE sha256(i.text) NOT IN (SELECT d FROM ref)
    """,
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same incremental dedup, via the Bloom-pruned two-phase path: a bitmap
    of the historical digests broadcasts, provably-new rows (any missed
    probe — no false negatives) bypass the join, and only Bloom hits reach
    the exact anti-join.  At 100 TB the incoming corpus therefore never
    fully shuffles.  False positives only cost an extra exact check — this
    query hash-matches the SAME oracle as ``dedup_incremental``, certifying
    the two methods byte-identical."""
    from cassandra_util_spark.operators.dedup import dedup_against

    d = _t(spark, sf_dir, "documents")
    reference = d.filter(F.col("doc_id") < 250)
    incoming = d.filter(F.col("doc_id") >= 200)
    return dedup_against(
        incoming, reference, "doc_id", ["text"], method="bloom", bloom_bits=1 << 16
    ).select("doc_id")


@query(
    "passage_dup_share",
    oracle=f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz yy xx ww vv uu tt ss' FROM documents),
    toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM all_docs),
    sized AS (
      SELECT doc_id, w, greatest(CAST(ceil(len(w) / 32.0) AS BIGINT), 1) AS k
      FROM toks),
    chunks AS (
      SELECT doc_id,
             md5(unnest(list_transform(range(0, k),
               i -> array_to_string(list_slice(w, i * 32 + 1, i * 32 + 32), ' ')))) AS fp
      FROM sized),
    freq AS (SELECT fp, count(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY fp)
    SELECT c.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
           round(CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 / count(*), 6) AS dup_share
    FROM chunks c JOIN freq f ON f.fp = c.fp
    GROUP BY c.doc_id
    """,
)
def passage_dup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplication share: the corpus is unioned with copies
    that share every prefix passage but diverge in the tail, and each
    document reports what fraction of its 32-word chunks also appear in
    another document — the boilerplate signal document-level dedup cannot
    see.  Chunking, fingerprint doc-frequency, and the per-doc rollup are
    hash-verified for all 1000 docs."""
    from cassandra_util_spark.operators.dedup import passage_dup_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz yy xx ww vv uu tt ss")).alias("text"),
    )
    return passage_dup_stats(
        d.unionByName(copies), "doc_id", "text", chunk_words=32, overlap=0
    )


@query(
    "dedup_span_removal",
    oracle=f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz yy xx ww vv uu tt ss' FROM documents),
    toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM all_docs),
    sized AS (
      SELECT doc_id, w, greatest(CAST(ceil(len(w) / 32.0) AS BIGINT), 1) AS k
      FROM toks),
    chunks AS (
      SELECT doc_id,
             CAST(unnest(range(0, k)) AS INT) AS chunk_id,
             unnest(list_transform(range(0, k),
               i -> array_to_string(list_slice(w, i * 32 + 1, i * 32 + 32), ' '))) AS chunk_text
      FROM sized),
    fps AS (SELECT doc_id, chunk_id, chunk_text, md5(chunk_text) AS fp FROM chunks),
    firsts AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_id) AS rn
      FROM fps),
    rebuilt AS (
      SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_id) AS clean_text,
             count(*) AS n_kept
      FROM firsts WHERE rn = 1 GROUP BY doc_id),
    counts AS (SELECT doc_id, count(*) AS n_chunks FROM fps GROUP BY doc_id)
    SELECT c.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           c.n_chunks,
           c.n_chunks - coalesce(r.n_kept, 0) AS n_dropped
    FROM counts c LEFT JOIN rebuilt r ON r.doc_id = c.doc_id
    """,
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-span EXCISION: over the corpus plus planted
    copies that share every prefix passage (the passage_dup_share fixture),
    each repeated 32-word span survives only at its globally first
    occurrence and documents are rebuilt from their surviving spans — the
    transformation whose measurement counterpart is passage_dup_share.
    Every rebuilt text, chunk count, and drop count across all 2000 docs is
    hash-verified against the same first-occurrence election in SQL."""
    from cassandra_util_spark.operators.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz yy xx ww vv uu tt ss")).alias("text"),
    )
    return remove_duplicate_spans(d.unionByName(copies), "doc_id", "text", chunk_words=32)


# Gopher signal CTEs + pass condition, shared by the gate query and the
# windowed loss-mask oracle (one definition -- the r13 single-source
# discipline for hand-inlined oracle fragments).
_GOPHER_SIG_CTES = r"""gbase AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w,
             list_filter(string_split(text, chr(10)), l -> l <> '') AS lines
      FROM documents),
    sig AS (
      SELECT doc_id,
        len(w) AS n_words,
        greatest(len(w), 1) AS d,
        coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS wc,
        length(text) - length(replace(text, '#', '')) AS nhash,
        (length(text) - length(replace(text, '...', ''))) / 3 AS nell,
        greatest(len(lines), 1) AS nl,
        len(list_filter(lines,
            l -> list_contains(['•','-','*'], substring(ltrim(l), 1, 1)))) AS bl,
        len(list_filter(lines,
            l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS el,
        len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS aw,
        len(list_filter(['the','be','to','of','and','that','have','with'],
            s -> list_contains(list_transform(w, x -> lower(x)), s))) AS sh
      FROM gbase)"""

_GOPHER_PASS_SQL = """(n_words BETWEEN 50 AND 100000)
        AND (round(wc / d, 6) BETWEEN 3.0 AND 10.0)
        AND round((nhash + nell) / d, 6) <= 0.1
        AND round(bl / nl, 6) <= 0.9
        AND round(el / nl, 6) <= 0.3
        AND round(aw / d, 6) >= 0.8
        AND sh >= 2"""


@query(
    "gopher_quality_gate",
    oracle=f"""
    WITH {_GOPHER_SIG_CTES}
    SELECT doc_id,
      CAST(n_words AS BIGINT) AS n_words,
      round(wc / d, 6) AS mean_word_len,
      round((nhash + nell) / d, 6) AS symbol_word_ratio,
      round(bl / nl, 6) AS bullet_line_frac,
      round(el / nl, 6) AS ellipsis_line_frac,
      round(aw / d, 6) AS alpha_word_frac,
      CAST(sh AS BIGINT) AS stop_hits,
      {_GOPHER_PASS_SQL} AS passes
    FROM sig
    """,
)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule battery (Rae et al. 2021 A1.1) over every document
    at the paper's published thresholds — word-count bounds, mean word
    length, symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, stopword presence — every per-document signal AND the
    composite pass flag hash-verified (all ratios are 6dp-rounded
    integer-ratio doubles, so the gate frontier is engine-exact)."""
    from cassandra_util_spark.operators.text import gopher_quality

    d = _t(spark, sf_dir, "documents")
    return gopher_quality(d, "doc_id", "text")


@query(
    "commonness_buckets",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
            FROM documents)
      WHERE term <> ''
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             round(SUM(tf.tf * dfreq.df)
                   / (SUM(tf.tf) * (SELECT count(*) FROM documents)), 6) AS commonness
      FROM tf JOIN dfreq ON tf.term = dfreq.term
      GROUP BY tf.doc_id),
    tiled AS (
      SELECT doc_id, commonness,
             CAST(ntile(3) OVER (ORDER BY commonness DESC, doc_id ASC) AS BIGINT) AS bucket
      FROM scored)
    SELECT doc_id, commonness, bucket,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
    FROM tiled
    """,
)
def commonness_buckets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus tiers: terciles of the
    commonness score (this engine's exactly-reproducible perplexity
    surrogate), ranked over a deterministic total order.  Tier membership
    for every document is hash-verified; the approx-percentile map-side
    variant (the no-global-sort 100 TB path) is recall-tested in pytest."""
    from cassandra_util_spark.operators.text import commonness_buckets

    d = _t(spark, sf_dir, "documents")
    return commonness_buckets(d, "doc_id", "text", buckets=3, mode="exact")


@query(
    "dedup_ngram_containment",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    subsets AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(list_slice(string_split(t, ' '), 1, 20), ' ') AS t
      FROM norm),
    alln AS (SELECT * FROM norm UNION ALL SELECT * FROM subsets),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM alln),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(n_common / least(sa.n_sh, sb.n_sh), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / least(sa.n_sh, sb.n_sh), 6) >= 0.9
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplication pairs: the corpus unioned with 20-word prefix
    excerpts of every document.  Each excerpt is FULLY contained in its
    source (containment 1.0) while its symmetric Jaccard is far below any
    dedup threshold — the quote/snippet/truncated-mirror case Jaccard
    misses.  Every flagged pair and its 6dp containment is hash-verified."""
    from cassandra_util_spark.operators.dedup import ngram_containment_pairs
    from cassandra_util_spark.operators.text import normalize_text

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", normalize_text(F.col("text")).alias("text")
    )
    subsets = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 20), " ").alias("text"),
    )
    return ngram_containment_pairs(
        d.unionByName(subsets), "doc_id", "text", n=3, threshold=0.9
    )


@query(
    "dedup_fingerprint_longest",
    oracle=f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, upper(text) || ' !!!' AS text FROM documents
    )
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (
        PARTITION BY md5({_NORM_SQL})
        ORDER BY length(text) DESC, doc_id ASC) AS rn
      FROM all_docs
    ) WHERE rn = 1
    """,
)
def dedup_fingerprint_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-policy dedup: the same formatting-insensitive collapse as
    ``dedup_fingerprint``, but the KEPT copy is the longest raw text
    (prefer=length, ties lowest id) — the keep-best-copy rule web-corpus
    dedup applies when formatting variants differ in completeness.  Here
    the punctuated shouting variants are strictly longer, so exactly the
    +1000000 ids survive — the policy inversion is hash-verified."""
    from cassandra_util_spark.operators.dedup import exact_dedup
    from cassandra_util_spark.operators.text import fingerprint

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    variant = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit(" !!!")).alias("text"),
    )
    alld = d.unionByName(variant).withColumn("fp", fingerprint(F.col("text")))
    return exact_dedup(
        alld, "doc_id", ["fp"], prefer=F.length(F.col("text"))
    ).select("doc_id")


@query(
    "dedup_within_doc_spans",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    planted AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(list_slice(string_split(t, ' '), 1, 32), ' ') || ' ' ||
             array_to_string(list_slice(string_split(t, ' '), 1, 32), ' ') || ' ' ||
             array_to_string(list_slice(string_split(t, ' '), 1, 32), ' ') AS t
      FROM base),
    alln AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    toks AS (
      SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS w
      FROM alln),
    chunked AS (
      SELECT doc_id,
             list_transform(range(0, greatest(CAST(ceil(len(w) / 32.0) AS BIGINT), 1)),
               i -> array_to_string(list_slice(w, i * 32 + 1, i * 32 + 32), ' ')) AS c
      FROM toks),
    kept AS (
      SELECT doc_id, c,
             list_transform(
               list_filter(range(1, len(c) + 1), i -> list_position(c, c[i]) = i),
               i -> c[i]) AS k
      FROM chunked)
    SELECT doc_id,
           array_to_string(k, ' ') AS clean_text,
           CAST(len(c) AS BIGINT) AS n_chunks,
           CAST(len(c) - len(k) AS BIGINT) AS n_dropped
    FROM kept
    """,
)
def dedup_within_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-span excision over the corpus plus planted
    self-repetitions (each document's first 32 normalized words repeated
    three times — chunk-aligned, so two of the three spans are internal
    repeats).  A pure map-only expression: zero shuffles, the cheapest
    possible plan at any corpus size.  Rebuilt texts and drop counts for
    all 2000 docs hash-verified."""
    from cassandra_util_spark.operators.dedup import remove_repeated_spans_within
    from cassandra_util_spark.operators.text import normalize_text

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rep = F.array_join(
        F.slice(F.split(normalize_text(F.col("text")), " "), 1, 32), " "
    )
    planted = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", rep, rep, rep).alias("text"),
    )
    return remove_repeated_spans_within(
        d.unionByName(planted), "doc_id", "text", chunk_words=32
    )


@query(
    "corpus_gate_report",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w,
             list_filter(string_split(text, chr(10)), l -> l <> '') AS lines
      FROM documents),
    sig AS (
      SELECT doc_id, source,
        len(w) AS n_words,
        greatest(len(w), 1) AS d,
        coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS wc,
        length(text) - length(replace(text, '#', '')) AS nhash,
        (length(text) - length(replace(text, '...', ''))) / 3 AS nell,
        greatest(len(lines), 1) AS nl,
        len(list_filter(lines,
            l -> list_contains(['•','-','*'], substring(ltrim(l), 1, 1)))) AS bl,
        len(list_filter(lines,
            l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS el,
        len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS aw,
        len(list_filter(['the','be','to','of','and','that','have','with'],
            s -> list_contains(list_transform(w, x -> lower(x)), s))) AS sh
      FROM base),
    gates AS (
      SELECT doc_id, source,
        CASE WHEN (n_words BETWEEN 50 AND 100000)
          AND (round(wc / d, 6) BETWEEN 3.0 AND 10.0)
          AND round((nhash + nell) / d, 6) <= 0.1
          AND round(bl / nl, 6) <= 0.9
          AND round(el / nl, 6) <= 0.3
          AND round(aw / d, 6) >= 0.8
          AND sh >= 2 THEN 1 ELSE 0 END AS pass
      FROM sig),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
            FROM documents)
      WHERE term <> ''
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    commonness AS (
      SELECT tf.doc_id,
             round(SUM(tf.tf * dfreq.df)
                   / (SUM(tf.tf) * (SELECT count(*) FROM documents)), 6) AS commonness
      FROM tf JOIN dfreq ON tf.term = dfreq.term
      GROUP BY tf.doc_id)
    SELECT g.source,
           count(*) AS n_docs,
           CAST(sum(g.pass) AS BIGINT) AS n_pass,
           round(CAST(sum(g.pass) AS BIGINT) / count(*), 6) AS pass_rate,
           round(CAST(sum(CAST(c.commonness AS DECIMAL(18,6))) AS DOUBLE)
                 / count(c.commonness), 6) AS avg_commonness
    FROM gates g LEFT JOIN commonness c ON c.doc_id = g.doc_id
    GROUP BY g.source
    """,
)
def corpus_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard a pipeline operator reads before tuning
    thresholds: per SOURCE, document counts, Gopher-gate pass rates, and
    the mean commonness score — composing two already-oracled operators
    (gopher_quality, commonness_score) into the per-provenance rollup that
    decides which feeds get cut.  Means are DECIMAL-summed over the
    6dp-rounded per-doc scores (the corpus_lang_profile discipline), so
    the aggregate is partitioning- and engine-exact."""
    from cassandra_util_spark.operators.text import commonness_score, gopher_quality

    d = _t(spark, sf_dir, "documents")
    gates = gopher_quality(d, "doc_id", "text").select(
        "doc_id", F.col("passes").cast("int").alias("pass")
    ).join(d.select("doc_id", "source"), "doc_id")
    com = commonness_score(d, "doc_id", "text").select("doc_id", "commonness")
    return (
        gates.join(com, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pass").cast("bigint").alias("n_pass"),
            F.round(F.sum("pass") / F.count(F.lit(1)), 6).alias("pass_rate"),
            F.round(
                F.sum(F.col("commonness").cast("decimal(18,6)")).cast("double")
                / F.count("commonness"),
                6,
            ).alias("avg_commonness"),
        )
    )


from cassandra_util_spark.functions import portable_hash32_sql as _h32_sql  # noqa: E402
from cassandra_util_spark.operators.text import (  # noqa: E402
    regex_token_count as _tokcount,
    regex_token_count_sql as _tokcount_sql,
)

_SHARD_SEED = "ep0"
_N_SHARDS = 8
_SHARD_GATE = _h32_sql(f"'{_SHARD_SEED}:' || CAST(doc_id AS VARCHAR)")
_SHARD_ORD = _h32_sql(f"'{_SHARD_SEED}:' || CAST(doc_id AS VARCHAR)", offset=9)


@query(
    "corpus_shard_plan",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             {_SHARD_GATE} AS gate,
             {_SHARD_ORD} AS ord
      FROM documents)
    SELECT doc_id,
           CAST(gate % {_N_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY gate % {_N_SHARDS}
             ORDER BY ord ASC, doc_id ASC) AS BIGINT) AS pos
    FROM g
    """,
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every document assigned a training
    shard and a within-shard position, both pure functions of
    (seed, doc_id) — the reproducible global reorder a training loader
    needs, WITHOUT a global sort.  The shard is the low bits of a portable
    md5 word; the order inside a shard is an independent second word of
    the same digest, so source-contiguous input is dispersed and the plan
    is one hash-partition exchange + per-shard sort (no range exchange, no
    skew sampling).  Changing the seed re-deals a fresh epoch order."""
    from cassandra_util_spark.operators.sampling import deterministic_shards

    d = _t(spark, sf_dir, "documents").select("doc_id")
    out = deterministic_shards(d, "doc_id", _N_SHARDS, seed=_SHARD_SEED)
    return out.select("doc_id", "shard", F.col("pos").cast("bigint").alias("pos"))


@query(
    "mixture_temperature_plan",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             round(sqrt(n_docs / CAST((SELECT sum(n_docs) FROM c) AS DOUBLE)), 6) AS wd
      FROM c),
    z AS (
      SELECT source, n_docs,
             round(wd / CAST((SELECT sum(CAST(wd AS DECIMAL(18,6))) FROM w) AS DOUBLE),
                   6) AS weight
      FROM w)
    SELECT source, n_docs, weight,
           round(least(1.0, weight * (SELECT min(n_docs / weight) FROM z) / n_docs),
                 6) AS target_frac
    FROM z
    """,
)
def mixture_temperature_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (alpha = 0.5, the sqrt rule):
    per-source counts → w_s ∝ sqrt(n_s/N) normalized into mixture weights
    → the per-source sampling fraction that realizes the mixture without
    upsampling (the scarcest-relative-to-weight source stays whole, the
    rest downsample — mixture_fractions' min rule, here in-plan).

    Float discipline for cross-engine exactness: every irrational step
    (sqrt, the two divisions) is an IEEE correctly-rounded double op
    rounded to 6dp, and the normalizer Z sums those 6dp values in DECIMAL
    so the only order-dependent operation is exact.  One partial-aggregate
    pass over the corpus; everything after runs on |sources| rows."""
    from pyspark.sql import Window

    from cassandra_util_spark.functions.windows import constant_partition_key

    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    # frame bounded by construction: |sources| rows post-aggregate — the
    # non-foldable key silences WindowExec's single-partition WARN without
    # changing the (single-group) semantics (functions/windows.py)
    everything = Window.partitionBy(constant_partition_key(F.col("source")))
    wd = F.round(
        F.sqrt(F.col("n_docs") / F.sum("n_docs").over(everything).cast("double")), 6
    )
    w = c.withColumn("wd", wd)
    weight = F.round(
        F.col("wd")
        / F.sum(F.col("wd").cast("decimal(18,6)")).over(everything).cast("double"),
        6,
    )
    z = w.withColumn("weight", weight).drop("wd")
    t = F.min(F.col("n_docs") / F.col("weight")).over(everything)
    return z.select(
        "source",
        "n_docs",
        "weight",
        F.round(
            F.least(F.lit(1.0), F.col("weight") * t / F.col("n_docs")), 6
        ).alias("target_frac"),
    )


@query(
    "adaptive_length_bounds",
    oracle="""
    WITH b AS (
      SELECT lang,
             round(quantile_cont(n_chars, 0.05), 4) AS lo,
             round(quantile_cont(n_chars, 0.95), 4) AS hi,
             count(*) AS n_docs
      FROM documents GROUP BY lang),
    k AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN b ON b.lang = d.lang
      WHERE d.n_chars BETWEEN b.lo AND b.hi
      GROUP BY d.lang)
    SELECT b.lang, b.lo, b.hi, b.n_docs,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM b LEFT JOIN k ON k.lang = b.lang
    """,
)
def adaptive_length_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive length gate: each language's own exact
    [p05, p95] interpolated percentile band of document length, plus the
    count the gate keeps — fixed thresholds are wrong across scripts
    (200 chars of zh is a document, of en a fragment).  Bounds rounded to
    4dp so the linear-interpolation frontier is engine-exact.  The gate
    join broadcasts |languages| rows; at extreme per-stratum cardinality
    the documented lever is percentile_approx in the same plan shape."""
    from cassandra_util_spark.operators.text import adaptive_length_report

    d = _t(spark, sf_dir, "documents")
    return adaptive_length_report(d, "lang", "n_chars", "doc_id", 0.05, 0.95)


@query(
    "dedup_cluster_sizes",
    oracle=f"""{_CLUSTERS_CTE}
    , full_c AS (
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
    sz AS (SELECT cluster, count(*) AS size FROM full_c GROUP BY cluster)
    SELECT size, count(*) AS n_clusters, CAST(sum(size) AS BIGINT) AS n_docs
    FROM sz GROUP BY size
    """,
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution over the same certified Jaccard
    pair graph as dedup_clusters: (size, n_clusters, n_docs) with
    singletons as size-1 clusters — the audit that tells a curation run
    whether duplication mass sits in a few giant mirror clusters (needs
    span excision / survivor sampling) or a collapse-safe long tail.  Two
    key-only aggregations on top of the hash-certified component closure;
    the histogram is at most |distinct sizes| rows at any corpus scale."""
    from cassandra_util_spark.operators.cluster import cluster_size_histogram
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return cluster_size_histogram(d, pairs, "doc_id")


@query(
    "events_skew_report",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    top AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 10)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, user_id ASC) AS BIGINT) AS rank,
           user_id, n,
           round(n / CAST((SELECT sum(n) FROM c) AS DOUBLE), 6) AS share
    FROM top
    """,
)
def events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key heavy-hitter audit: the 10 heaviest user_id values with
    row counts and table share — the measurement that routes a key to
    salted_agg/salted_join (or AQE skew split) BEFORE a groupBy/join on it
    straggles.  The count exchange carries |distinct keys| rows
    (combiner-reduced), the top-k is a TakeOrderedAndProject heap (never a
    full sort), and the denominator reuses the same exchange as one
    broadcast row — exactly k rows reach the driver at any scale."""
    from cassandra_util_spark.functions.skew import skew_report

    e = _t(spark, sf_dir, "events")
    return skew_report(e, "user_id", top_k=10)


_H31_X = "(CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) & 2147483647)"


@query(
    "dedup_winnowing",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS wd FROM norm),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, len(wd) - 1),
                            i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2]) AS g
      FROM toks WHERE len(wd) >= 3),
    h AS (SELECT doc_id, list_transform(g, x -> {_H31_X}) AS hh FROM grams),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(hh) - 6),
                 i -> list_aggregate(list_slice(hh, i, i + 7), 'min'))) AS fp
        FROM h WHERE len(hh) >= 8)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup candidates (Schleimer/Wilkerson/Aiken SIGMOD'03,
    the MOSS scheme): ordered 3-gram hashes, per-window-of-8 minima,
    distinct per doc, pairs sharing >= 2 fingerprints.  The guarantee: any
    common run of w+k-1 = 10 words between two documents surfaces at least
    one shared fingerprint — position-free overlap detection at ~2/(w+1)
    of full shingle density (measured ~5x fewer values in the self-join
    than the Jaccard shingle path on this corpus).  The oracle replays
    gram hashing, window minima, and the pair count verbatim in SQL."""
    from cassandra_util_spark.operators.dedup import winnowing_pairs

    d = _t(spark, sf_dir, "documents")
    return winnowing_pairs(d, "doc_id", "text", k=3, w=8, min_shared=2)


from cassandra_util_spark.operators.sampling import (  # noqa: E402
    gate_threshold as _gate_threshold,
    sample_gate_sql as _sample_gate_sql,
)

_SPLIT_GATE = _sample_gate_sql("doc_id", "split")
_SPLIT_T1 = _gate_threshold(0.90)
_SPLIT_T2 = _gate_threshold(0.95)


@query(
    "corpus_split_assignment",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_SPLIT_GATE} < {_SPLIT_T1} THEN 'train'
                WHEN {_SPLIT_GATE} < {_SPLIT_T2} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5): every document lands
    in exactly one split as a pure function of (seed, doc_id) — no row
    ever leaks between splits across re-runs, repartitions, or corpus
    growth (an existing key's gate value never changes).  Cumulative
    integer thresholds are computed once driver-side and inlined into
    both engines; the map-only CASE folds into the scan at any scale."""
    from cassandra_util_spark.operators.sampling import corpus_splits

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return corpus_splits(d, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05})


@query(
    "corpus_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT source,
             {_REGEX_TOKS_SQL} AS toks
      FROM documents),
    agg AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM t GROUP BY source)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / CAST((SELECT sum(n_tokens) FROM agg) AS DOUBLE), 6)
             AS token_share,
           round(n_tokens / CAST(n_docs AS DOUBLE), 6) AS mean_tokens
    FROM agg
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture-design planning table: per-source document counts, total
    regex-pretokenizer token counts, each source's share of the corpus
    token budget, and mean tokens per document — what
    temperature/mixture weighting actually consumes (weights over TOKENS,
    not documents, since document length varies by source).  Integer token
    sums are exact under any partitioning; the two shares are single
    rounded double divisions.  One partial-aggregate pass; everything
    after runs on |sources| rows."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toks = _tokcount(F.col("text"))
    agg = d.select("source", toks.alias("toks")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
    )
    # |sources|-row frame post-aggregate: bounded by construction, so the
    # single-group key treatment applies (functions/windows.py)
    from cassandra_util_spark.functions.windows import constant_partition_key

    everything = Window.partitionBy(constant_partition_key(F.col("source")))
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.sum("n_tokens").over(everything).cast("double"), 6
        ).alias("token_share"),
        F.round(F.col("n_tokens") / F.col("n_docs").cast("double"), 6).alias(
            "mean_tokens"
        ),
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): the aggregate-filtered join —
    a HAVING subquery drives the join, so the heavy side reduces BEFORE
    any join happens (partial-aggregate shuffle on the already-grouped
    key), and only qualifying orders touch the customer dimension
    (broadcast).  Quantities sum in DECIMAL for partitioning-exact
    HAVING-frontier semantics."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "bm25_search",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    dl AS (SELECT doc_id, len(w) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(w) AS term FROM toks)
      WHERE term IN ('merge', 'vector', 'stream')
      GROUP BY doc_id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             CAST(round(((s.n_docs - q.df + 0.5::DOUBLE) / (q.df + 0.5::DOUBLE))
                  * ((t.tf * 2.2::DOUBLE)
                     / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
                          * (d.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))))
                  * 1000000000.0::DOUBLE) AS BIGINT) AS s9
      FROM tf t
      JOIN dfq q USING (term)
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats s),
    agg AS (
      SELECT doc_id,
             round(CAST(CAST(sum(s9) AS BIGINT) AS DOUBLE)
                   / 1000000000.0::DOUBLE, 6) AS score
      FROM scored GROUP BY doc_id)
    SELECT doc_id, score, CAST(rank AS INT) AS rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM agg)
    WHERE rank <= 10
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval for the query {{merge, vector, stream}}:
    tf saturation (k1=1.2) and document-length normalization (b=0.75) with
    the log-free rational idf (the doc_top_terms discipline — libm ln is
    engine-specific at the last ulp).  Per-term scores integer-scale to
    round(s*1e9) and sum exactly, so document scores AND the top-10
    frontier hash-match the oracle bit for bit.  The query-term IN-list
    folds into the scan; the df table is bounded by the QUERY (3 rows
    here), not the corpus vocabulary; global top-k is orderBy+limit
    (TakeOrderedAndProject — per-partition partial top-k, no full sort, no
    unbounded single-partition window)."""
    from cassandra_util_spark.operators.text import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, "doc_id", "text", ("merge", "vector", "stream"), k=10)


@query(
    "dsir_select",
    oracle=f"""
    WITH norm AS (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, lang, list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    grams AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      FROM toks WHERE len(w) >= 2),
    bk AS (SELECT doc_id, lang, CAST({_p31('g')} % 256 AS INT) AS k FROM grams),
    raw_c AS (SELECT doc_id, k, count(*) AS c FROM bk GROUP BY doc_id, k),
    tgt_k AS (SELECT k, count(*) AS t FROM bk WHERE lang = 'en' GROUP BY k),
    raw_k AS (SELECT k, CAST(sum(c) AS BIGINT) AS r FROM raw_c GROUP BY k),
    tot AS (SELECT (SELECT CAST(sum(r) AS BIGINT) FROM raw_k) AS R,
                   (SELECT CAST(sum(t) AS BIGINT) FROM tgt_k) AS T),
    ratios AS (
      SELECT COALESCE(rk.k, tk.k) AS k,
             CAST(round((CAST((2 * COALESCE(tk.t, 0) + 1) * (2 * tot.R + 256) AS DOUBLE)
                   / CAST((2 * COALESCE(rk.r, 0) + 1) * (2 * tot.T + 256) AS DOUBLE))
                   * 1000000000.0::DOUBLE) AS BIGINT) AS lam9
      FROM raw_k rk FULL OUTER JOIN tgt_k tk ON rk.k = tk.k CROSS JOIN tot)
    SELECT r.doc_id,
           CAST(sum(r.c) AS BIGINT) AS n_grams,
           round(CAST(CAST(sum(r.c * ra.lam9) AS BIGINT) AS DOUBLE)
                 / CAST(sum(r.c) AS BIGINT) / 1000000000.0::DOUBLE, 6) AS weight
    FROM raw_c r JOIN ratios ra ON ra.k = r.k
    GROUP BY r.doc_id
    """,
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights (Xie et al., NeurIPS 2023)
    of every document toward the English slice as the target domain:
    (doc_id, n_grams, weight), weight > 1 ⇔ the document's hashed-bigram
    profile is more target-like than raw-like.  The estimator is the
    log-free tf-weighted mean likelihood ratio with add-half smoothing —
    all-integer bucket counts, one double division per bucket scaled to
    round(λ·1e9), exact bigint sums — so weights hash-match the oracle bit
    for bit (see operators/selection.py for why not log).  Bucket tables
    are bounded by num_buckets=256 regardless of corpus size: the fit
    broadcasts by construction, unlike a vocabulary table."""
    from cassandra_util_spark.operators.selection import dsir_importance_weights

    d = _t(spark, sf_dir, "documents")
    return dsir_importance_weights(
        d, d.filter(F.col("lang") == "en"), "doc_id", "text", n=2, num_buckets=256
    )


@query(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)),
    h AS (SELECT doc_id, {_p31('sh')} AS h FROM sh),
    sig AS (
      SELECT doc_id, p.j, min((p.a * h.h + p.b) % 2147483647) AS v
      FROM h CROSS JOIN {_minhash_params_sql(64)}
      GROUP BY doc_id, p.j),
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS bucket
      FROM sig GROUP BY doc_id, j // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS nid, b.doc_id AS rid
      FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id >= 200 AND b.doc_id < 250),
    m AS (
      SELECT c.nid, c.rid, count(*) FILTER (WHERE sa.v = sb.v) AS matches
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.nid
      JOIN sig sb ON sb.doc_id = c.rid AND sb.j = sa.j
      GROUP BY 1, 2),
    dups AS (SELECT DISTINCT nid FROM m WHERE round(matches / 64.0, 6) >= 0.5)
    SELECT doc_id FROM documents
    WHERE doc_id >= 200 AND doc_id NOT IN (SELECT nid FROM dups)
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup against a historical store — the fuzzy
    counterpart of ``dedup_incremental``: the incoming slice (doc_id >=
    200) drops every document whose MinHash-LSH estimated Jaccard against
    ANY historical document (doc_id < 250) reaches 0.5.  Catches what
    digest dedup cannot: the 50 exact overlaps (est 1.0) AND re-crawled
    near-variants that a byte hash misses.  At warehouse scale the
    reference's (signature, band) tables are the persisted index — band
    keys probe, signatures verify, content is never re-read; the band join
    shuffles (id, band, bucket) rows only.  Same portable signature
    machinery as ``dedup_minhash_lsh`` (the banding code is literally
    shared), so the oracle replays both sides bit for bit."""
    from cassandra_util_spark.operators.dedup import lsh_dedup_against

    d = _t(spark, sf_dir, "documents")
    reference = d.filter(F.col("doc_id") < 250)
    incoming = d.filter(F.col("doc_id") >= 200)
    return lsh_dedup_against(
        incoming, reference, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.5
    ).select("doc_id")


@query(
    "embedding_prototypes",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    e AS (
      SELECT label, i.i AS pos,
             CAST(round(v[i.i + 1] * 1073741824.0::DOUBLE) AS BIGINT) AS qv
      FROM q CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
    sums AS (SELECT label, pos, CAST(sum(qv) AS BIGINT) AS s, count(*) AS n
             FROM e GROUP BY label, pos),
    cent AS (SELECT label, pos, (CAST(s AS DOUBLE) / n) / 1073741824.0::DOUBLE AS c, n
             FROM sums),
    carr AS (SELECT label, list(c ORDER BY pos) AS cvec, max(n) AS n_members
             FROM cent GROUP BY label),
    scored AS (
      SELECT q.vec_id, q.label,
             round(list_cosine_similarity(q.v, carr.cvec), 4) AS proto_cos,
             carr.n_members
      FROM q JOIN carr ON carr.label = q.label),
    ranked AS (
      SELECT vec_id, label, proto_cos,
             CAST(row_number() OVER (PARTITION BY label
               ORDER BY proto_cos DESC, vec_id) AS INT) AS rank,
             n_members
      FROM scored)
    SELECT vec_id, label, proto_cos, rank,
           rank > CAST(floor(0.2::DOUBLE * n_members) AS BIGINT) AS keep
    FROM ranked
    """,
)
def embedding_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes pruning (Sorscher et al. 2022): rank every embedding
    by cosine to its label's mean centroid and mark the most prototypical
    20% per label for dropping — the "easy examples carry the least
    marginal information" data-pruning policy.  Centroids are
    engine-exact: components quantize to a 2^-30 integer grid and sum as
    exact bigints (float summation order would differ per partitioning),
    so the centroid, every 4dp cosine, the per-label ranking, and the cut
    frontier all hash-match the oracle.  The centroid table is one row per
    label and broadcasts; scoring is map-only; the only corpus shuffle is
    the per-label rank window."""
    from cassandra_util_spark.operators.similarity import prototypicality_prune

    d = _t(spark, sf_dir, "embeddings")
    return prototypicality_prune(d, "vec_id", "label", "embedding", drop_fraction=0.2)


@query(
    "hard_negatives",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 16),
    assigned AS (
      SELECT vec_id, label, v, cell FROM (
        SELECT c.vec_id, c.label, c.v, s.cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(CASE WHEN isnan(list_cosine_similarity(c.v, s.cv))
                                     THEN 0 ELSE list_cosine_similarity(c.v, s.cv)
                                END, 4) DESC, s.cell ASC) AS rn
        FROM corpus c CROSS JOIN seeds s) WHERE rn = 1),
    cand AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
             round(CASE WHEN isnan(list_cosine_similarity(a.v, b.v)) THEN 0
                        ELSE list_cosine_similarity(a.v, b.v) END, 4) AS cos_sim
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.label <> b.label),
    ranked AS (
      SELECT anchor_id, negative_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY anchor_id
               ORDER BY cos_sim DESC, negative_id ASC) AS BIGINT) AS rank
      FROM cand)
    SELECT anchor_id, negative_id, cos_sim, rank FROM ranked WHERE rank <= 3
    """,
)
def hard_negatives_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the 3
    most-similar embeddings with a DIFFERENT label, candidates restricted
    to IVF-cell co-residents (16 deterministic hash-ordered seed cells —
    the semantic_dedup scoping, which is what bounds the quadratic term by
    Σ|cell|² at 100 TB; hard negatives are by definition near the anchor,
    so cell co-residence is the right candidate generator).  4dp cosine
    rounding + negative_id tiebreak make the ranking frontier
    engine-exact; the oracle replays seeds, assignment, and the top-k."""
    from cassandra_util_spark.operators.similarity import hard_negatives

    d = _t(spark, sf_dir, "embeddings")
    return hard_negatives(
        d, "vec_id", "label", "embedding", k=3, mode="cell",
        num_centroids=16, refine_iters=0,
    )


@query(
    "q14_promo_revenue",
    oracle="""
    WITH j AS (
      SELECT CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS price,
             p_type
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
    agg AS (
      SELECT SUM(CASE WHEN p_type = 'PROMO' THEN price
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS sp,
             SUM(price) AS st
      FROM j)
    SELECT round(100.0::DOUBLE * (CAST(sp AS DOUBLE) / CAST(st AS DOUBLE)), 6)
             AS promo_share,
           CAST(sp AS DOUBLE) AS promo_revenue,
           CAST(st AS DOUBLE) AS total_revenue
    FROM agg
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): the conditional-aggregate
    ratio over a dimension-joined fact scan — part broadcasts, the shipdate
    window pushes into the parquet scan, and revenue terms multiply in
    DECIMAL so both sums are partitioning-exact; the share is one rounded
    double division."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType))
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(price.alias("price"), "p_type")
    )
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("price")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("sp"),
        F.sum("price").alias("st"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * (F.col("sp").cast("double") / F.col("st").cast("double")), 6
        ).alias("promo_share"),
        F.col("sp").cast("double").alias("promo_revenue"),
        F.col("st").cast("double").alias("total_revenue"),
    )


_BM25_QUERIES_VALUES = (
    "VALUES (1, ['merge', 'vector']), (2, ['stream', 'batch']), (3, ['customer'])"
)


def _bm25_batch_ctes(values_sql: str, k: int, source: str = "documents") -> str:
    """The batch-BM25 oracle CTE chain ending in a ``run`` CTE of
    (qid, doc_id, score, rank<=k) — shared by the retrieval contract query,
    its evaluation query, and the passage-retrieval composition so all
    replay identical arithmetic.  ``source`` is any relation exposing
    (doc_id, text)."""
    return f"""
    norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM {source}),
    toks AS (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    dls AS (SELECT doc_id, len(w) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
    q(qid, terms) AS ({values_sql}),
    qt AS (SELECT DISTINCT qid, unnest(terms) AS term FROM q),
    ex AS (SELECT t.doc_id, d.dl, unnest(t.w) AS term
           FROM toks t JOIN dls d ON d.doc_id = t.doc_id),
    tf AS (
      SELECT qt.qid, ex.doc_id, ex.dl, ex.term, count(*) AS tf
      FROM ex JOIN qt USING (term)
      GROUP BY qt.qid, ex.doc_id, ex.dl, ex.term),
    dfq AS (
      SELECT term, count(*) AS df
      FROM (SELECT DISTINCT term, doc_id FROM tf) GROUP BY term),
    scored AS (
      SELECT t.qid, t.doc_id,
             round(CAST(CAST(sum(
               CAST(round(((s.n_docs - q2.df + 0.5::DOUBLE) / (q2.df + 0.5::DOUBLE))
                    * ((t.tf * 2.2::DOUBLE)
                       / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
                            * (t.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))))
                    * 1000000000.0::DOUBLE) AS BIGINT)
             ) AS BIGINT) AS DOUBLE) / 1000000000.0::DOUBLE, 6) AS score
      FROM tf t JOIN dfq q2 USING (term) CROSS JOIN stats s
      GROUP BY t.qid, t.doc_id),
    run AS (
      SELECT qid, doc_id, score, rank FROM (
        SELECT qid, doc_id, score,
               row_number() OVER (PARTITION BY qid
                 ORDER BY score DESC, doc_id) AS rank
        FROM scored)
      WHERE rank <= {k})"""


@query(
    "bm25_batch_search",
    oracle=f"""
    WITH {_bm25_batch_ctes(_BM25_QUERIES_VALUES, 5)}
    SELECT qid AS query_id, doc_id, score, CAST(rank AS INT) AS rank FROM run
    """,
)
def bm25_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25 retrieval: top-5 documents for each of three queries in
    ONE corpus pass — the retrieval-evaluation / RAG-indexing shape.  The
    corpus tokenizes once; the exploded query-term table (bounded by the
    query workload, not the corpus) broadcasts into the token stream so
    non-query tokens die map-side; ranking is a window keyed by query_id,
    parallel across queries.  Same integer-scaled scoring as
    ``bm25_search`` — a single-query batch reproduces it exactly
    (test-pinned)."""
    from cassandra_util_spark.operators.text import bm25_batch_topk

    d = _t(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(1, ["merge", "vector"]), (2, ["stream", "batch"]), (3, ["customer"])],
        "query_id int, terms array<string>",
    )
    return bm25_batch_topk(d, q, "doc_id", "text", k=5)


@query(
    "retrieval_eval",
    oracle=f"""
    WITH {_bm25_batch_ctes(_BM25_QUERIES_VALUES, 5)},
    qrels AS (
      SELECT q.qid, t.doc_id
      FROM toks t CROSS JOIN q
      WHERE list_has_all(t.w, q.terms)),
    n_rel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
    hit AS (
      SELECT r.qid, count(*) AS hits, min(r.rank) AS fr
      FROM run r JOIN qrels u ON u.qid = r.qid AND u.doc_id = r.doc_id
      GROUP BY r.qid)
    SELECT n.qid AS query_id, n.n_rel,
           CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_at_k,
           round(COALESCE(h.hits, 0) / n.n_rel, 6) AS recall_at_k,
           COALESCE(round(1.0::DOUBLE / h.fr, 6), 0.0::DOUBLE) AS mrr_at_k
    FROM n_rel n LEFT JOIN hit h ON h.qid = n.qid
    """,
)
def retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation (the trec_eval shape): the batch BM25 run is
    scored against deterministic pseudo-qrels — a document is relevant to
    a query iff its normalized token set contains ALL the query's terms —
    yielding per-query recall@5 and MRR@5.  Every metric is an integer
    count or one rounded division, so the report hash-matches the oracle;
    run and qrels replay the SAME shared SQL fragment the retrieval
    contract query uses, keeping the two certifications coupled."""
    from cassandra_util_spark.operators.text import bm25_batch_topk, retrieval_metrics
    from cassandra_util_spark.operators.text import _norm_tokens

    d = _t(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(1, ["merge", "vector"]), (2, ["stream", "batch"]), (3, ["customer"])],
        "query_id int, terms array<string>",
    )
    run = bm25_batch_topk(d, q, "doc_id", "text", k=5)
    qrels = (
        d.select("doc_id", _norm_tokens(F.col("text")).alias("toks"))
        .crossJoin(F.broadcast(q))
        .filter(F.forall(F.col("terms"), lambda t: F.array_contains(F.col("toks"), t)))
        .select("query_id", "doc_id")
    )
    return retrieval_metrics(run, qrels, "query_id", "doc_id", "rank", k=5)


@query(
    "passage_retrieval",
    oracle=f"""
    WITH toks_c AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    sized_c AS (
      SELECT doc_id, w, greatest(CAST(ceil(len(w) / 32.0) AS BIGINT), 1) AS kc
      FROM toks_c),
    chunks_c AS (
      SELECT doc_id * 100 + CAST(unnest(range(0, kc)) AS BIGINT) AS cid,
             unnest(list_transform(range(0, kc),
               i -> array_to_string(list_slice(w, i * 32 + 1, i * 32 + 32), ' ')))
               AS ctext
      FROM sized_c),
    dchunks AS (
      SELECT cid, ctext FROM (
        SELECT cid, ctext, min(cid) OVER (PARTITION BY ctext) AS m FROM chunks_c)
      WHERE cid = m),
    {_bm25_batch_ctes(_BM25_QUERIES_VALUES, 3, source="(SELECT cid AS doc_id, ctext AS text FROM dchunks)")}
    SELECT qid AS query_id, doc_id AS passage_id,
           doc_id // 100 AS src_doc, CAST(doc_id % 100 AS INT) AS chunk_id,
           score, CAST(rank AS INT) AS rank
    FROM run
    """,
)
def passage_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage retrieval — the RAG indexing pipeline end to end, composed
    from three certified operators in ONE plan: documents chunk into
    32-word passages (chunk_documents), byte-identical passages collapse
    to their first occurrence (exact_dedup on the content digest), and
    the batch BM25 scorer ranks the top-3 passages per query over the
    deduplicated passage table.  Oracle composition mirrors operator
    composition: the chunk CTE replays the chunker, the min-over-text CTE
    replays the dedup survivor rule, and the SHARED _bm25_batch_ctes
    fragment replays the scorer — so the composed result hash-matches
    end to end."""
    from cassandra_util_spark.operators.dedup import exact_dedup
    from cassandra_util_spark.operators.packing import chunk_documents
    from cassandra_util_spark.operators.text import bm25_batch_topk

    d = _t(spark, sf_dir, "documents")
    ch = chunk_documents(d, "doc_id", "text", chunk_words=32, overlap=0)
    passages = ch.select(
        (F.col("doc_id") * 100 + F.col("chunk_id")).alias("pid"),
        F.col("chunk_text").alias("text"),
    )
    deduped = exact_dedup(passages, "pid", ["text"])
    q = spark.createDataFrame(
        [(1, ["merge", "vector"]), (2, ["stream", "batch"]), (3, ["customer"])],
        "query_id int, terms array<string>",
    )
    run = bm25_batch_topk(deduped, q, "pid", "text", k=3)
    return run.select(
        "query_id",
        F.col("pid").alias("passage_id"),
        F.expr("pid div 100").alias("src_doc"),
        (F.col("pid") % 100).cast("int").alias("chunk_id"),
        "score",
        "rank",
    )


@query(
    "dedup_edit_distance",
    oracle=f"""
    WITH t AS (SELECT doc_id, substr({_NORM_SQL}, 1, 32) AS title FROM documents),
    k AS (
      SELECT doc_id, substr(title, 1, 4) AS k FROM t
      UNION
      SELECT doc_id, substr(title, -4, 4) FROM t),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM k a JOIN k b ON a.k = b.k AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(levenshtein(ta.title, tb.title) AS BIGINT) AS distance
    FROM cand
    JOIN t ta ON ta.doc_id = id_a
    JOIN t tb ON tb.doc_id = id_b
    WHERE abs(len(ta.title) - len(tb.title)) <= 4
      AND levenshtein(ta.title, tb.title) <= 4
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-string near-dup via Levenshtein over the normalized 32-char
    title prefix, candidates blocked on shared 4-char prefix OR suffix —
    the technique for the regime token-set similarity can't reach (too few
    tokens; 1-2 character edits).  Unit-cost edit distance is identical in
    Spark codegen and ANSI levenshtein, so blocking, the length
    pre-filter, and every distance hash-match the oracle."""
    from cassandra_util_spark.operators.dedup import edit_distance_pairs

    d = _t(spark, sf_dir, "documents")
    return edit_distance_pairs(d, "doc_id", "text", max_distance=4, title_chars=32)


@query(
    "orders_rollup_totals",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in ONE pass (ROLLUP): per (status, priority),
    per status, and grand total — the multi-level report that would
    otherwise be three scans unioned.  Catalyst expands the grouping sets
    into a single partial-aggregated shuffle; ``lvl`` is the grouping_id
    bitmask disambiguating subtotal rows from data NULLs (identical
    semantics in ANSI GROUPING()).  Money sums in DECIMAL, cast to double
    only at the edge."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "lvl", "n_orders", "total"
        )
    )


@query(
    "events_funnel",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS wt FROM events),
    t1 AS (
      SELECT user_id, min(wt) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, min(e.wt) AS t2
      FROM ev e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.wt >= t1.t1
      GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, min(e.wt) AS t3
      FROM ev e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.wt >= t2.t2
      GROUP BY e.user_id)
    SELECT '1_view' AS stage, count(*) AS n_users FROM t1
    UNION ALL
    SELECT '2_click', count(*) FROM t2
    UNION ALL
    SELECT '3_purchase', count(*) FROM t3
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): stage N counts
    users whose FIRST stage-N event follows their first stage-N-1 event —
    the sequential-dependency analysis a flat per-type count gets wrong
    (a purchase before any view is not a conversion).  Each stage is one
    filter + user-keyed partial-min aggregate joined to the previous
    frontier; event times compare as epoch-µs integers (exact).  Three
    user-keyed shuffles total; stage tables only shrink.  Property-tested
    against a Python reference fold on arbitrary event sets."""
    from cassandra_util_spark.operators.analytics import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "event_type", writetime_micros(F.col("ts")),
        ["view", "click", "purchase"],
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    first AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.d0 // 7 AS cohort_week,
             (e.day - f.d0) // 7 AS week_offset
      FROM ev e JOIN first f ON f.user_id = e.user_id)
    SELECT cohort_week, week_offset, count(*) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted as
    active per (cohort_week, week_offset) — the table behind every
    retention curve.  Day/week indices are integer divisions of epoch-µs
    (all values post-epoch, so truncate == floor in both engines); one
    user-keyed aggregate for the cohort assignment, one distinct over
    (user, cohort, offset), one counting aggregate — partial aggregation
    throughout, output bounded by cohorts × offsets."""
    from cassandra_util_spark.operators.analytics import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(
        ev, "user_id", writetime_micros(F.col("ts")), period_days=7
    ).select(
        F.col("cohort_period").alias("cohort_week"),
        F.col("period_offset").alias("week_offset"),
        "n_active",
    )


from cassandra_util_spark.functions.zorder import zorder_value_sql as _zv_sql  # noqa: E402

# epoch-µs of 2024-01-01T00:00:00Z — the events table's era; offsets from it
# keep the z-order hour dimension small and non-negative
_ZBASE_US = 1_704_067_200_000_000


@query(
    "events_zorder_layout",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id,
             greatest(0, (epoch_us(ts) - {_ZBASE_US}) // 3600000000) AS hour_off
      FROM events)
    SELECT event_id, user_id, hour_off,
           {_zv_sql(['user_id', 'hour_off'], 16)} AS zval
    FROM e
    """,
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (user_id, event-hour): the
    data-layout pass that makes parquet min/max row-group pruning work on
    BOTH a user predicate and a time predicate simultaneously — sort a
    100 TB table by this bigint before writing (repartitionByRange +
    sortWithinPartitions) and every interleaved dimension gets partial
    skipping, where a single-column sort gives one dimension everything
    and the others nothing.  Pure unrolled-bit integer expression: no
    shuffle, no Python, bit-exact across engines (the SQL is GENERATED
    from the same loop as the Column expression)."""
    from cassandra_util_spark.functions.zorder import zorder_value

    e = _t(spark, sf_dir, "events")
    # clamp at the era base: pre-era events would go negative — where Spark
    # `div` (truncate) and SQL `//` (floor) disagree AND zorder_value's
    # non-negative input contract breaks; clamped they land in bucket 0
    hour_off = F.greatest(
        F.lit(0), F.expr(f"(unix_micros(ts) - {_ZBASE_US}) div 3600000000")
    )
    return e.select(
        "event_id",
        "user_id",
        hour_off.alias("hour_off"),
        zorder_value([F.col("user_id"), hour_off], 16).alias("zval"),
    )


@query(
    "hybrid_retrieval_rrf",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    dls AS (SELECT doc_id, len(w) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(w) AS term FROM toks)
      WHERE term IN ('merge', 'vector', 'stream')
      GROUP BY doc_id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bscored AS (
      SELECT t.doc_id,
             round(CAST(CAST(sum(
               CAST(round(((s.n_docs - q.df + 0.5::DOUBLE) / (q.df + 0.5::DOUBLE))
                    * ((t.tf * 2.2::DOUBLE)
                       / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
                            * (d.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))))
                    * 1000000000.0::DOUBLE) AS BIGINT)
             ) AS BIGINT) AS DOUBLE) / 1000000000.0::DOUBLE, 6) AS score
      FROM tf t JOIN dfq q USING (term) JOIN dls d ON d.doc_id = t.doc_id
      CROSS JOIN stats s GROUP BY t.doc_id),
    text_run AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bscored) WHERE rank <= 20),
    vec_run AS (
      SELECT neighbor_id AS doc_id, rank FROM (
        SELECT c.vec_id AS neighbor_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(
                            list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                            list_transform(c.embedding, x -> CAST(x AS DOUBLE))) DESC,
                          c.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = 0) WHERE rank <= 20),
    contrib AS (
      SELECT doc_id,
             CAST(round((1.0::DOUBLE / (60 + rank)) * 1000000000.0::DOUBLE)
                  AS BIGINT) AS c9
      FROM text_run
      UNION ALL
      SELECT doc_id,
             CAST(round((1.0::DOUBLE / (60 + rank)) * 1000000000.0::DOUBLE)
                  AS BIGINT) AS c9
      FROM vec_run),
    fused AS (
      SELECT doc_id, count(*) AS n_runs,
             round(CAST(CAST(sum(c9) AS BIGINT) AS DOUBLE)
                   / 1000000000.0::DOUBLE, 6) AS rrf_score
      FROM contrib GROUP BY doc_id)
    SELECT doc_id, CAST(n_runs AS BIGINT) AS n_runs, rrf_score,
           CAST(rank AS INT) AS rank
    FROM (SELECT doc_id, n_runs, rrf_score,
                 row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
          FROM fused)
    WHERE rank <= 10
    """,
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical run
    (terms {{merge, vector, stream}}, top-20) fuses with an embedding
    cosine run (query vec_id=0, top-20; vec ids share the doc id space)
    through RRF — only RANKS enter the combined score, so incomparable
    score scales fuse robustly.  Integer-scaled contributions make the
    fused scores and frontier engine-exact; both input runs and the fusion
    are individually certified operators."""
    from cassandra_util_spark.operators.similarity import cosine_topk
    from cassandra_util_spark.operators.text import bm25_topk, rrf_fuse

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    text_run = bm25_topk(d, "doc_id", "text", ("merge", "vector", "stream"), k=20)
    vec_run = cosine_topk(e, e.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=20).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank")
    )
    return rrf_fuse([text_run, vec_run], "doc_id", k=10)


# ---------------------------------------------------------------------------
# Compaction / mutation surface, round 4 additions (append-only: the driver's
# correctness window is registration-prefix-ordered)
# ---------------------------------------------------------------------------

@query(
    "tombstone_compaction",
    oracle=f"""
    WITH cells AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS writetime,
             (event_id % 19 = 0) AS tombstone
      FROM events),
    w AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY writetime DESC, tombstone DESC, event_id DESC) AS rn
      FROM cells)
    SELECT user_id, event_type, event_id, writetime, tombstone
    FROM w
    WHERE rn = 1
      AND (NOT tombstone OR writetime >= {TTL_NOW_MS * 1000} - 604800000000)
    """,
)
def tombstone_compaction_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction with deletion markers: every 19th event is a row tombstone
    for its (user_id, event_type) key.  Newest cell wins (delete-wins tie);
    winning tombstones inside the 7-day grace window survive as markers
    (zombie prevention), older ones purge.  One key shuffle total."""
    from cassandra_util_spark.operators.merge import compact_with_tombstones

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .withColumn("tombstone", F.col("event_id") % 19 == 0)
    )
    out = compact_with_tombstones(
        ev,
        ["user_id", "event_type"],
        "writetime",
        "tombstone",
        gc_grace_us=7 * 24 * 3600 * 1_000_000,
        now_us=TTL_NOW_MS * 1000,
        tiebreak=["event_id"],
    )
    return out.select("user_id", "event_type", "event_id", "writetime", "tombstone")


@query(
    "cdc_apply",
    oracle="""
    WITH log AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS writetime, 'U' AS op
      FROM events WHERE event_id % 3 <> 0
      UNION ALL
      SELECT user_id, event_type, event_id, epoch_us(ts) AS writetime,
             CASE WHEN event_id % 6 = 0 THEN 'D' ELSE 'U' END AS op
      FROM events WHERE event_id % 3 = 0),
    w AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY writetime DESC, (op = 'D') DESC, event_id DESC) AS rn
      FROM log)
    SELECT user_id, event_type, event_id, writetime
    FROM w WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (MERGE INTO surface): a base snapshot (implicit
    upserts) plus a changelog of upserts and deletes collapses to the final
    table state in one key shuffle — newest mutation wins, deletes beat
    upserts at equal writetime, deleted keys vanish."""
    from cassandra_util_spark.operators.merge import apply_changelog

    ev = _t(spark, sf_dir, "events").withColumn(
        "writetime", writetime_micros(F.col("ts"))
    )
    base = ev.filter(F.col("event_id") % 3 != 0).select(
        "user_id", "event_type", "event_id", "writetime"
    )
    changes = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id",
        "event_type",
        "event_id",
        "writetime",
        F.when(F.col("event_id") % 6 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    return apply_changelog(
        base, changes, ["user_id", "event_type"], "writetime", "op",
        tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# Catalyst subquery/outer-join surface: TPC-H shapes Q7/Q8/Q13/Q15/Q17/Q22
# (adapted to the driver schema: no partsupp/comment/phone columns, so each
# keeps the QUERY SHAPE — the Catalyst feature it exercises — with the
# predicates this schema supports)
# ---------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume by year (TPC-H Q7 shape): the same dimension
    table joined TWICE under different roles (supplier nation vs customer
    nation) with a symmetric pair predicate.  Both nation copies broadcast;
    the fact chain shuffles only on its join keys; the shipdate window
    pushes into the scan."""
    li = _t(spark, sf_dir, "lineitem")
    sd = li.schema["l_shipdate"].dataType
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(sd))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast(sd))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS nation
      FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM all_nations GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share inside a region (TPC-H Q8 shape): an 8-table
    join where nation plays two roles (market membership via the customer
    side, share attribution via the supplier side) feeding a conditional-
    aggregate ratio.  Every dimension broadcasts; both sums are DECIMAL so
    the one double division is partitioning-exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    od = o.schema["o_orderdate"].dataType
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast(od))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast(od))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("sn"),
        F.sum("volume").alias("st"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("sn").cast("double") / F.col("st").cast("double"), 6).alias(
            "mkt_share"
        ),
        F.col("st").cast("double").alias("total_volume"),
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution over ALL customers (TPC-H Q13 shape): the
    left-outer join with an extra join-condition predicate — customers with
    zero qualifying orders must still appear (c_count=0), which an inner
    join or a WHERE-clause filter would silently drop.  COUNT(col) ignoring
    the outer side's nulls is the load-bearing semantic."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue supplier (TPC-H Q15 shape): a derived aggregate consumed
    twice — once as the join input, once reduced to a scalar MAX that
    filters it.  The scalar side is a broadcast 1-row crossJoin (no driver
    collect), and the equality compares exact DECIMAL totals, so ties all
    surface instead of an arbitrary limit-1."""
    li = _t(spark, sf_dir, "lineitem")
    sd = li.schema["l_shipdate"].dataType
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(sd))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast(sd))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("total_revenue")
        )
    )
    s = _t(spark, sf_dir, "supplier")
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0::DOUBLE, 6) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.2::DOUBLE * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                                   AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity order revenue (TPC-H Q17 shape): a correlated scalar
    subquery — each row compares against ITS part's average quantity —
    decorrelated by hand into a per-part aggregate joined back to the fact.
    The brand filter broadcasts into the fact scan FIRST, so the average is
    computed only over the ~1/25 of lineitem that can ever reach the
    comparison (same result: the subquery is per-partkey).  The threshold
    derives from a DECIMAL sum over an exact count, making the comparison
    frontier engine-exact."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    pruned = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    thr = pruned.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        pruned.join(thr, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


@query(
    "q22_idle_balances",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS threshold
      FROM customer WHERE c_acctbal > 0.0),
    eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer, avg_bal
      WHERE c_acctbal > threshold
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT'))
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible GROUP BY c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle above-average balances (TPC-H Q22 shape): a scalar-subquery
    threshold (broadcast 1-row crossJoin, no collect) combined with a
    NOT EXISTS anti-join against the fact — customers holding money but
    never placing an urgent order.  The anti-join needs only o_custkey (the
    priority predicate folds into the scan), so column pruning cuts the
    orders scan to one column plus the pushed filter."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "bigram_lm_quality",
    oracle=f"""
    WITH norm AS (SELECT doc_id, source, {{NORM}} AS t FROM documents),
    toks AS (SELECT doc_id, source,
                    list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    ref AS (SELECT * FROM toks
            WHERE source IN ('src0', 'src1', 'src2', 'src3')),
    ref_uni AS (
      SELECT wd, count(*) AS c_uni
      FROM (SELECT unnest(w) AS wd FROM ref) GROUP BY wd),
    ref_tot AS (SELECT CAST(SUM(c_uni) AS BIGINT) AS t_total FROM ref_uni),
    ref_bg AS (
      SELECT w1, w2, count(*) AS c12 FROM (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM ref, unnest(generate_series(1, len(w) - 1)) AS u(i))
      GROUP BY w1, w2),
    doc_bg AS (
      SELECT doc_id, w1, w2, count(*) AS tf FROM (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i))
      GROUP BY doc_id, w1, w2),
    terms AS (
      SELECT doc_id, tf,
             CASE
               WHEN c12 IS NOT NULL THEN
                 CAST(round(ln(c12 / CAST(c1 AS DOUBLE)) * 1000000000.0::DOUBLE)
                      AS BIGINT)
               WHEN c2 IS NOT NULL THEN
                 CAST(round(ln(0.4::DOUBLE * c2 / CAST(t_total AS DOUBLE))
                            * 1000000000.0::DOUBLE) AS BIGINT)
               ELSE
                 CAST(round(ln(0.4::DOUBLE * 0.4::DOUBLE / CAST(t_total AS DOUBLE))
                            * 1000000000.0::DOUBLE) AS BIGINT)
             END AS s9
      FROM doc_bg
      LEFT JOIN ref_bg USING (w1, w2)
      LEFT JOIN (SELECT wd AS w1, c_uni AS c1 FROM ref_uni) USING (w1)
      LEFT JOIN (SELECT wd AS w2, c_uni AS c2 FROM ref_uni) USING (w2)
      CROSS JOIN ref_tot)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_transitions,
           round(CAST(SUM(tf * s9) AS BIGINT) / 1000000000.0::DOUBLE
                 / CAST(SUM(tf) AS BIGINT), 6) AS avg_logprob
    FROM terms GROUP BY doc_id
    """.replace("{NORM}", _NORM_SQL),
)
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring with stupid backoff: a reference model
    (sources src0-src3) scores every document by mean transition
    log-probability — the n-gram-LM form of the CCNet/KenLM perplexity
    gate, with integer-scaled log terms making the frontier engine-exact."""
    from cassandra_util_spark.operators.text import bigram_lm_score

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    return bigram_lm_score(d, ref, "doc_id", "text", alpha=0.4)


def _rp_oracle() -> str:
    from cassandra_util_spark.operators.similarity import rademacher_signs_sql_values

    return f"""
    WITH signs(j, i, s) AS (VALUES {rademacher_signs_sql_values(64, 16)}),
    r AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE)
                        * 1000000000.0::DOUBLE) AS BIGINT) AS r
      FROM embeddings, unnest(generate_series(0, 63)) AS u(i))
    SELECT vec_id, CAST(j AS INT) AS j,
           round(CAST(SUM(r * s) AS BIGINT)
                 / (1000000000.0::DOUBLE * sqrt(16.0::DOUBLE)), 6) AS y
    FROM r JOIN signs USING (i)
    GROUP BY vec_id, j
    """


@query("embedding_rp_project", oracle=_rp_oracle())
def embedding_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 dims with an
    engine-portable Rademacher matrix (md5-parity signs; Achlioptas 2001).
    The 100 TB coarse-score lever: 4× fewer multiplies per candidate and
    4× less vector traffic, exported component-wise so all 16·N projected
    values hash-verify."""
    from cassandra_util_spark.operators.similarity import random_projection

    e = _t(spark, sf_dir, "embeddings")
    proj = random_projection(F.col("embedding"), dim=64, k=16)
    return e.select("vec_id", proj.alias("p")).select(
        "vec_id", F.posexplode("p").alias("j", "y")
    )


def _rp_rerank_oracle() -> str:
    from cassandra_util_spark.operators.similarity import rademacher_signs_sql_values

    return f"""
    WITH signs(j, i, s) AS (VALUES {rademacher_signs_sql_values(64, 16)}),
    r AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE)
                        * 1000000000.0::DOUBLE) AS BIGINT) AS r
      FROM embeddings, unnest(generate_series(0, 63)) AS u(i)),
    proj AS (
      SELECT vec_id, j,
             CAST(round(CAST(SUM(r * s) AS BIGINT)
                        / (1000000000.0::DOUBLE * sqrt(16.0::DOUBLE)) * 1000000.0::DOUBLE)
                  AS BIGINT) AS y6
      FROM r JOIN signs USING (i) GROUP BY vec_id, j),
    qp AS (SELECT j, y6 AS qy6 FROM proj WHERE vec_id = 0),
    qn AS (SELECT CAST(SUM(qy6 * qy6) AS BIGINT) AS nq FROM qp),
    coarse AS (
      SELECT p.vec_id,
             round(CAST(CAST(SUM(p.y6 * q.qy6) AS BIGINT) AS DOUBLE)
                   / (sqrt(CAST(CAST(SUM(p.y6 * p.y6) AS BIGINT) AS DOUBLE))
                      * sqrt(CAST(nq AS DOUBLE))), 6) AS ccos
      FROM proj p JOIN qp q USING (j) CROSS JOIN qn
      WHERE p.vec_id <> 0
      GROUP BY p.vec_id, nq),
    cand AS (
      SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY ccos DESC, vec_id ASC) AS crank
        FROM coarse) WHERE crank <= 50)
    SELECT c.vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT e.vec_id,
             row_number() OVER (
               ORDER BY list_cosine_similarity(
                          list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(q.embedding, x -> CAST(x AS DOUBLE))) DESC,
                        e.vec_id ASC) AS rank
      FROM embeddings e JOIN cand USING (vec_id)
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q) c
    WHERE rank <= 10
    """


@query("ann_rp_rerank", oracle=_rp_rerank_oracle())
def ann_rp_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine ANN: score ALL candidates in the 16-dim random
    projection (4× cheaper per candidate, exact-integer dot products on the
    6dp-rounded projections so the coarse frontier is engine-exact), keep
    the top-50, then exact-cosine re-rank only those in the original 64-dim
    space.  At 100 TB the coarse pass is the only full-corpus sweep — the
    expensive exact pass touches a constant 50 rows per query."""
    from pyspark.sql import Window

    from cassandra_util_spark.operators.similarity import cosine, random_projection

    e = _t(spark, sf_dir, "embeddings")
    proj = random_projection(F.col("embedding"), dim=64, k=16)
    to6 = lambda col: F.transform(col, lambda y: F.round(y * 1e6).cast("bigint"))  # noqa: E731
    pe = e.select("vec_id", to6(proj).alias("p6"))
    qp = pe.filter(F.col("vec_id") == 0).select(F.col("p6").alias("q6"))

    def dotp(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    coarse = (
        pe.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qp))
        .select(
            "vec_id",
            F.round(
                dotp(F.col("p6"), F.col("q6")).cast("double")
                / (
                    F.sqrt(dotp(F.col("p6"), F.col("p6")).cast("double"))
                    * F.sqrt(dotp(F.col("q6"), F.col("q6")).cast("double"))
                ),
                6,
            ).alias("ccos"),
        )
    )
    # orderBy().limit() compiles to TakeOrderedAndProject — per-partition
    # top-k merged on the driver, NOT a single-partition global window (the
    # scale-correct global top-k; a bare Window.orderBy funnels the whole
    # corpus through one task)
    cand = (
        coarse.orderBy(F.col("ccos").desc(), F.col("vec_id").asc())
        .limit(50)
        .select("vec_id")
    )
    qvec = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    top10 = (
        e.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(qvec))
        .withColumn("score", cosine(F.col("embedding"), F.col("q_vec")))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    # rank over the already-limited 10 rows — the window is trivial here
    we = Window.partitionBy(_cpk(F.col("vec_id"))).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return top10.withColumn("rank", F.row_number().over(we).cast("bigint")).select(
        F.col("vec_id").alias("neighbor_id"), "rank"
    )


@query(
    "contamination_report",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    grams AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM toks WHERE len(w) >= 5)
    ),
    totals AS (
      SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
    bench AS (SELECT DISTINCT sh FROM grams WHERE doc_id % 50 = 0),
    hits AS (
      SELECT g.doc_id, count(*) AS n_collisions
      FROM grams g JOIN bench b ON g.sh = b.sh
      WHERE g.doc_id % 50 <> 0
      GROUP BY g.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_collisions, 0) AS BIGINT) AS n_collisions,
           CASE WHEN coalesce(t.n_grams, 0) = 0 THEN 0.0
                ELSE round(coalesce(h.n_collisions, 0)
                           / CAST(t.n_grams AS DOUBLE), 6) END AS overlap
    FROM documents d
    LEFT JOIN totals t ON t.doc_id = d.doc_id
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 50 <> 0
    """,
)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit: decontamination's binary flag upgraded to the
    per-document overlap FRACTION (distinct 5-grams shared with the
    benchmark slice / total 5-grams) — the number that separates a shared
    idiom from a verbatim benchmark copy."""
    from cassandra_util_spark.operators.dedup import contamination_overlap

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return contamination_overlap(train, bench, "doc_id", "text", n=5)


@query(
    "dedup_soft_keep",
    oracle=f"""{_CLUSTERS_CTE},
    assigned AS (
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
    csizes AS (
      SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
      FROM assigned GROUP BY cluster)
    SELECT a.doc_id, a.cluster, s.cluster_size,
           {{GATE}} < (4294967296 // s.cluster_size) AS keep
    FROM assigned a JOIN csizes s USING (cluster)
    """.replace("{GATE}", __import__("cassandra_util_spark.operators.sampling",
                                     fromlist=["sample_gate_sql"]).sample_gate_sql(
                                         "a.doc_id", "soft1")),
)
def dedup_soft_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft (probabilistic) dedup: each near-dup cluster contributes ONE
    expected survivor via a deterministic 1/|cluster| hash gate, instead of
    always the lowest id — duplicate mass becomes uniform without the
    lowest-id selection bias, and which copy survives is reproducible
    (portable md5 gate, no RNG).  Same Jaccard edges and transitive
    closure as dedup_clusters, hash-checked through the identical
    recursive-CTE oracle."""
    from cassandra_util_spark.operators.cluster import soft_dedup
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return soft_dedup(d, pairs, "doc_id", seed="soft1")


@query(
    "events_activity_anomalies",
    oracle="""
    WITH counts AS (
      SELECT user_id AS k, date_trunc('hour', ts) AS b, count(*) AS n
      FROM events GROUP BY user_id, date_trunc('hour', ts)),
    moments AS (
      SELECT k, CAST(SUM(n) AS BIGINT) AS s1,
             CAST(SUM(n * n) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS h
      FROM counts GROUP BY k),
    scored AS (
      SELECT c.k, c.b, c.n,
             CAST(m.s1 AS DOUBLE) / m.h AS mean,
             CAST(m.s2 AS DOUBLE) / m.h
               - (CAST(m.s1 AS DOUBLE) / m.h) * (CAST(m.s1 AS DOUBLE) / m.h)
               AS var
      FROM counts c JOIN moments m USING (k))
    SELECT k AS user_id, CAST(epoch(b) AS BIGINT) AS bucket_start,
           CAST(n AS BIGINT) AS n_events,
           round((CAST(n AS DOUBLE) - mean) / sqrt(var), 4) AS z
    FROM scored
    WHERE var > 0 AND abs((CAST(n AS DOUBLE) - mean) / sqrt(var)) >= 2.0
    """,
)
def events_activity_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly burst/outage detection: buckets ≥2 population σ from
    the user's own mean hourly rate.  Moments are exact integer aggregates,
    so the z frontier is engine-identical; two shuffles total, z map-only."""
    from cassandra_util_spark.operators.analytics import activity_anomalies

    ev = _t(spark, sf_dir, "events")
    return activity_anomalies(ev, "ts", "user_id", "hour", z_threshold=2.0)


@query(
    "retention_rule_impact",
    oracle="""
    WITH agg AS (
      SELECT count(*) AS total,
             SUM(CASE WHEN l_orderkey >= 100 AND l_orderkey <= 500
                      THEN 1 ELSE 0 END) AS r1,
             SUM(CASE WHEN (l_suppkey >= 1 AND l_suppkey <= 3)
                           AND l_partkey <= 50 THEN 1 ELSE 0 END) AS r2,
             SUM(CASE WHEN (l_orderkey >= 100 AND l_orderkey <= 500)
                       OR ((l_suppkey >= 1 AND l_suppkey <= 3)
                           AND l_partkey <= 50) THEN 1 ELSE 0 END) AS rany
      FROM lineitem)
    SELECT 'purge_orders' AS rulename, CAST(r1 AS BIGINT) AS n_convicted,
           round(CAST(r1 AS DOUBLE) / total, 6) AS share FROM agg
    UNION ALL
    SELECT 'purge_supplier_lowparts', CAST(r2 AS BIGINT),
           round(CAST(r2 AS DOUBLE) / total, 6) FROM agg
    UNION ALL
    SELECT '__any__', CAST(rany AS BIGINT),
           round(CAST(rany AS DOUBLE) / total, 6) FROM agg
    """,
)
def retention_rule_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule dry-run impact in one scan: how many rows each retention
    rule would convict (independent counts) plus the de-overlapped __any__
    union the deletion would actually remove — the pre-arming report the
    reference's aggregate status counters cannot answer."""
    from cassandra_util_spark.plans.rules import rule_impact_report

    li = KeyedTable(
        _t(spark, sf_dir, "lineitem"),
        TableMeta(("l_orderkey", "l_suppkey", "l_partkey"), ("l_linenumber",)),
        "lineitem",
    )
    rules = [
        Rule("purge_orders", {"l_orderkey": (Range("100", "500"),)}),
        Rule(
            "purge_supplier_lowparts",
            {"l_suppkey": (Range("1", "3"),), "l_partkey": (Range(None, "50"),)},
        ),
    ]
    return rule_impact_report(li, rules)


@query(
    "events_cube_profile",
    oracle="""
    SELECT event_type,
           CAST(date_part('dow', ts) AS INT) AS dow,
           CAST(GROUPING(event_type, CAST(date_part('dow', ts) AS INT)) AS BIGINT)
             AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY CUBE (event_type, CAST(date_part('dow', ts) AS INT))
    """,
)
def events_cube_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, day-of-week): all four aggregation
    granularities — per cell, per type, per weekday, grand total — in ONE
    pass with partial aggregation, disambiguated by grouping_id (a NULL
    dimension value vs a rolled-up dimension are different things).  Sums
    in DECIMAL so every granularity is partitioning-exact."""
    ev = _t(spark, sf_dir, "events")
    dow = (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow")
    return (
        ev.select("event_type", dow, "value")
        .cube("event_type", "dow")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_sum"),
        )
        .select("event_type", "dow", "gid", "n_events", "value_sum")
    )


@query(
    "embedding_mean_pool",
    oracle="""
    WITH ex AS (
      SELECT vec_id // 16 AS grp, i AS pos,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE)
                        * 1000000000.0::DOUBLE) AS BIGINT) AS x9
      FROM embeddings, unnest(generate_series(0, 63)) AS u(i)),
    per_dim AS (
      SELECT grp, pos, CAST(SUM(x9) AS BIGINT) AS s9,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ex GROUP BY grp, pos)
    SELECT grp, CAST(pos AS INT) AS pos, n AS n_vectors,
           round(CAST(s9 AS DOUBLE) / 1000000000.0::DOUBLE / n, 6) AS val
    FROM per_dim
    """,
)
def embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→document embedding pooling: element-wise mean per group of 16
    vectors via exact integer sums (partition-invariant, unlike avg()),
    exported component-wise so all 64·G pooled values hash-verify."""
    from cassandra_util_spark.operators.similarity import mean_pool_embeddings

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "grp", F.expr("vec_id div 16")
    )
    pooled = mean_pool_embeddings(e, "grp", "embedding")
    return pooled.select(
        "grp",
        F.posexplode("pooled").alias("pos", "val"),
        "n_vectors",
    ).select("grp", "pos", "n_vectors", "val")


_CM_HASH_SQL = (
    "CAST(('0x' || substring(md5('cm:' || CAST(i AS VARCHAR) || ':' "
    "|| CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 256"
)


@query(
    "sketch_count_min_users",
    oracle=f"""
    WITH d(i) AS (VALUES (0), (1), (2), (3)),
    cells AS (
      SELECT i AS row, {_CM_HASH_SQL} AS idx, count(*) AS c
      FROM events, d GROUP BY 1, 2),
    keys AS (SELECT DISTINCT user_id FROM events),
    probe AS (
      SELECT user_id, CAST(MIN(c.c) AS BIGINT) AS cm_estimate
      FROM (SELECT user_id, i, {_CM_HASH_SQL} AS idx FROM keys, d) k
      JOIN cells c ON c.row = k.i AND c.idx = k.idx
      GROUP BY user_id),
    exact AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id)
    SELECT user_id, cm_estimate, exact_n
    FROM probe JOIN exact USING (user_id)
    """,
)
def sketch_count_min_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch audit: per-user point estimates from a
    4×256 counter table (portable md5 rows — every counter reproducible in
    any engine) joined against exact counts.  The sketch never
    underestimates (CM's one-sided error), pinned per key by the oracle."""
    from cassandra_util_spark.operators.sketches import count_min_build, count_min_query

    ev = _t(spark, sf_dir, "events")
    sk = count_min_build(ev, "user_id", depth=4, width=256)
    keys = ev.select("user_id").distinct()
    est = count_min_query(sk, keys, "user_id", depth=4, width=256)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return est.join(exact, "user_id")


_HLL_HASH_SQL = (
    "CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT)"
)


@query(
    "sketch_hll_registers",
    oracle=f"""
    SELECT bucket, MAX(r) AS register FROM (
      SELECT h % 512 AS bucket,
             CASE WHEN (h // 512) = 0 THEN CAST(24 AS BIGINT)
                  ELSE 23 - CAST(floor(log2(h // 512)) AS BIGINT) END AS r
      FROM (SELECT {_HLL_HASH_SQL} AS h FROM events))
    GROUP BY bucket
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table (p=9: 512 buckets, max leading-zero rank
    per bucket) over user ids — the mergeable distinct-count sketch whose
    every register is exact integer arithmetic on the portable hash, so two
    engines (and any two partitionings, and any union of per-split
    sketches) produce the identical table."""
    from cassandra_util_spark.operators.sketches import hll_build

    ev = _t(spark, sf_dir, "events")
    return hll_build(ev, "user_id", p=9)


_HLL_TYPE_HASH_SQL = (
    "CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT)"
)


@query(
    "sketch_hll_per_type",
    oracle=f"""
    WITH regs AS (
      SELECT grp, bucket, MAX(r) AS register FROM (
        SELECT event_type AS grp, h % 512 AS bucket,
               CASE WHEN (h // 512) = 0 THEN CAST(24 AS BIGINT)
                    ELSE 23 - CAST(floor(log2(h // 512)) AS BIGINT) END AS r
        FROM (SELECT event_type, {_HLL_TYPE_HASH_SQL} AS h FROM events))
      GROUP BY grp, bucket),
    agg AS (
      SELECT grp, count(*) AS filled,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(40 - register AS INT)) AS BIGINT)
               AS s_filled
      FROM regs GROUP BY grp),
    raw AS (
      SELECT grp, CAST(512 - filled AS BIGINT) AS n_zero,
             round(188686.82445861166::DOUBLE
                   / (CAST(s_filled + (512 - filled) * 1099511627776 AS DOUBLE)
                      / 1099511627776.0::DOUBLE), 4) AS raw_estimate
      FROM agg)
    SELECT grp AS event_type, n_zero, raw_estimate,
           CASE WHEN raw_estimate <= 1280.0 AND n_zero > 0
                THEN round(512.0::DOUBLE * ln(512.0::DOUBLE / n_zero), 4)
                ELSE raw_estimate END AS estimate
    FROM raw
    """,
)
def sketch_hll_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimates from grouped HLL sketches —
    one pass builds all five sketches, the estimate arithmetic (exact
    integer harmonic sums, one division, linear-counting correction) is
    mirrored literally in the oracle so even the ESTIMATES hash-match."""
    from cassandra_util_spark.operators.sketches import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    ev = _t(spark, sf_dir, "events")
    regs = hll_build_grouped(ev, "event_type", "user_id", p=9)
    return hll_estimate_grouped(regs, p=9).select(
        F.col("grp").alias("event_type"), "n_zero", "raw_estimate", "estimate"
    )


@query(
    "runstore_compaction_view",
    oracle="""
    WITH runs AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS writetime FROM events
      UNION ALL
      SELECT user_id, event_type, event_id, epoch_us(ts) FROM events
      WHERE user_id <= 50
      UNION ALL
      SELECT user_id, event_type, event_id, epoch_us(ts) FROM events
      WHERE user_id BETWEEN 25 AND 75)
    SELECT user_id, event_type, event_id, writetime FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_id
               ORDER BY writetime DESC) AS rn
      FROM runs) WHERE rn = 1
    """,
)
def runstore_compaction_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSM run-store end to end, driver-checked: three overlapping runs
    (full + two re-delivered slices) append to a store, size-tiered
    compaction merges until one run remains, and the returned view must be
    the exact LWW merge of everything appended — the compaction invariant
    as a hash-checked contract, not just a pytest."""
    import tempfile

    from cassandra_util_spark.sources.runs import RunStore

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .select("user_id", "event_type", "event_id", "writetime")
    )
    store = RunStore(tempfile.mkdtemp(prefix="runstore-q-"), TableMeta(("user_id",), ("event_id",), "writetime"))
    store.append_run(ev)
    store.append_run(ev.filter(F.col("user_id") <= 50))
    store.append_run(ev.filter(F.col("user_id").between(25, 75)))
    guard = 0
    while len(store.live_runs()) > 1 and guard < 10:
        if not store.compact(spark, min_threshold=2):
            break
        guard += 1
    return store.read_merged(spark).select(
        "user_id", "event_type", "event_id", "writetime"
    )


@query("ivf_persisted_probe", oracle=None)
def ivf_persisted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVF index end to end: build the partitioned layout in
    a temp dir (K=16 portable seeds, refine_iters=0 — the same parameters
    as ann_ivf_topk), probe it, and hash-match the SAME oracle — proving
    the on-disk partition-pruned path returns byte-identical neighbors to
    the in-memory plan."""
    from cassandra_util_spark.sources.ivf_index import probe_ivf_index, write_ivf_index
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivfq-") + "/idx"
    write_ivf_index(e, path, num_centroids=16, refine_iters=0)
    return probe_ivf_index(
        spark, path, e.filter(F.col("vec_id") < 5), k=10, nprobe=4
    )


ORACLES["ivf_persisted_probe"] = ORACLES["ann_ivf_topk"]


@query(
    "orders_ledger_reconciliation",
    oracle="""
    WITH ledger AS (
      SELECT o_orderkey AS k,
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS BIGINT)
               AS expected_total
      FROM orders WHERE o_orderkey % 3 = 0),
    actual AS (
      SELECT l_orderkey AS k,
             CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS BIGINT)
               AS actual_total
      FROM lineitem GROUP BY l_orderkey)
    SELECT coalesce(l.k, a.k) AS o_orderkey,
           CASE WHEN l.k IS NULL THEN 'actual_only'
                WHEN a.k IS NULL THEN 'ledger_only'
                ELSE 'both' END AS presence,
           l.expected_total, a.actual_total
    FROM ledger l FULL OUTER JOIN actual a ON l.k = a.k
    """,
)
def orders_ledger_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation (the audit-join every billing/ETL pipeline
    runs): a partial ledger FULL OUTER JOINed to per-order line totals,
    every key classified both/ledger_only/actual_only — rows missing from
    EITHER side must surface, which inner/left joins silently drop.
    Totals are rounded DECIMAL sums exported as integers."""
    ledger = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice").cast("decimal(18,2)"), 0)
            .cast("bigint")
            .alias("expected_total"),
        )
    )
    actual = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 0)
            .cast("bigint")
            .alias("actual_total")
        )
    )
    l, a = ledger.alias("l"), actual.alias("a")
    return l.join(a, F.col("l.k") == F.col("a.k"), "full_outer").select(
        F.coalesce(F.col("l.k"), F.col("a.k")).alias("o_orderkey"),
        F.when(F.col("l.k").isNull(), "actual_only")
        .when(F.col("a.k").isNull(), "ledger_only")
        .otherwise("both")
        .alias("presence"),
        "expected_total",
        "actual_total",
    )


@query(
    "events_sliding_window_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sliding_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS sliding_n
    FROM events
    """,
)
def events_sliding_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sliding aggregate via a RANGE window frame: per event,
    the DECIMAL value sum and count over the user's preceding 2 hours —
    the interval frame (RANGE, not ROWS) whose boundary is a time delta,
    computed in one pass per user partition with no self-join.  A ROWS
    frame would be wrong (fixed row count ≠ fixed time span); a windowed
    groupBy would bucket, not slide."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").withColumn(
        "wt", F.unix_micros(F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("wt")
        .rangeBetween(-7_200_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias("sliding_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("sliding_n"),
    )


@query(
    "acctbal_histogram_percentiles",
    oracle="""
    WITH hist AS (
      SELECT LEAST(255, GREATEST(0,
               CAST(floor((c_acctbal - (-1000.0)) / 11000.0 * 256) AS BIGINT)))
               AS bin,
             count(*) AS cnt
      FROM customer GROUP BY 1),
    cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    params(p) AS (VALUES (0.05), (0.5), (0.95)),
    hit AS (
      SELECT p, bin, cnt, cum,
             CAST(ceil(p * n) AS BIGINT) AS target,
             row_number() OVER (PARTITION BY p ORDER BY bin) AS rn
      FROM params, cum, tot
      WHERE cum >= CAST(ceil(p * n) AS BIGINT))
    SELECT p,
           round(-1000.0::DOUBLE
                 + (CAST(bin AS DOUBLE)
                    + CAST(target - (cum - cnt) AS DOUBLE) / cnt)
                 * 42.96875::DOUBLE, 4) AS value
    FROM hit WHERE rn = 1
    """,
)
def acctbal_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch percentiles: customer balances binned into a
    256-bin mergeable count table over [-1000, 10000), percentiles read
    off by exact-integer rank walk + one in-bin interpolation — the
    deterministic, engine-portable alternative to percentile_approx, with
    error bounded by one bin width (~43 units here)."""
    from cassandra_util_spark.operators.histogram import (
        equi_width_histogram,
        histogram_percentiles,
    )

    c = _t(spark, sf_dir, "customer")
    hist = equi_width_histogram(c, "c_acctbal", -1000.0, 10000.0, bins=256)
    return histogram_percentiles(hist, [0.05, 0.5, 0.95], -1000.0, 10000.0, bins=256)


@query(
    "pii_audit_report",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 2 = 0
                          THEN ' contact user' || CAST(doc_id AS VARCHAR)
                               || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                               || '.' || CAST(doc_id % 100 AS VARCHAR)
                          ELSE '' END
                  || CASE WHEN doc_id % 5 = 0
                          THEN ' ssn 123-45-6789' ELSE '' END
                  || CASE WHEN doc_id % 7 = 0
                          THEN ' tel +1 (555) 010-'
                               || CAST(1000 + doc_id % 9000 AS VARCHAR)
                          ELSE '' END AS t
      FROM documents),
    m AS (
      SELECT doc_id,
             len(regexp_extract_all(t,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS email,
             regexp_replace(t,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                 '<EMAIL>', 'g') AS t1
      FROM aug),
    m2 AS (
      SELECT doc_id, email,
             len(regexp_extract_all(t1, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS ssn,
             regexp_replace(t1, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS t2
      FROM m),
    m3 AS (
      SELECT doc_id, email, ssn,
             len(regexp_extract_all(t2, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS ipv4,
             regexp_replace(t2, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS t3
      FROM m2),
    m4 AS (
      SELECT doc_id, email, ssn, ipv4,
             len(regexp_extract_all(t3, '\\+?\\d[\\d\\s().-]{7,}\\d')) AS phone
      FROM m3)
    SELECT 'email' AS pii_type, CAST(SUM(email) AS BIGINT) AS n_matches,
           CAST(SUM(CASE WHEN email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
    FROM m4
    UNION ALL
    SELECT 'ssn', CAST(SUM(ssn) AS BIGINT),
           CAST(SUM(CASE WHEN ssn > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM m4
    UNION ALL
    SELECT 'ipv4', CAST(SUM(ipv4) AS BIGINT),
           CAST(SUM(CASE WHEN ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM m4
    UNION ALL
    SELECT 'phone', CAST(SUM(phone) AS BIGINT),
           CAST(SUM(CASE WHEN phone > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM m4
    """,
)
def pii_audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit over a corpus with UNEVEN injection (only some docs carry
    each type, so the per-type doc counts differ): total matches and
    affected docs per pattern, counted through the redaction chain's
    sequential view so types never double-count each other's spans."""
    from cassandra_util_spark.operators.text import pii_report

    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
                F.lit("."), (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" tel +1 (555) 010-"), (F.lit(1000) + F.col("doc_id") % 9000).cast("string")),
        ).otherwise(F.lit("")),
    )
    return pii_report(d.select("doc_id", aug.alias("text")), "doc_id", "text")


@query(
    "doc_length_histogram",
    oracle="""
    SELECT LEAST(63, GREATEST(0,
             CAST(floor((n_chars - 0.0) / 2048.0 * 64) AS BIGINT))) AS bin,
           count(*) AS cnt
    FROM documents GROUP BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document length distribution as a mergeable 64-bin histogram over
    [0, 2048) chars — the curation dashboard's shape plot, and the exact
    count table histogram_percentiles reads quantiles from."""
    from cassandra_util_spark.operators.histogram import equi_width_histogram

    d = _t(spark, sf_dir, "documents")
    return equi_width_histogram(d, "n_chars", 0.0, 2048.0, bins=64)


@query(
    "corpus_zipf_audit",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split({NORM}, ' '), x -> x <> '')) AS term
      FROM documents),
    freq AS (SELECT term, count(*) AS freq FROM toks GROUP BY term)
    SELECT CAST(rank AS BIGINT) AS rank, term, freq,
           CAST(rank * freq AS BIGINT) AS rank_freq
    FROM (SELECT term, freq,
                 row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
          FROM freq)
    WHERE rank <= 30
    """.replace("{NORM}", _NORM_SQL),
)
def corpus_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf audit: the 30 most frequent corpus terms with rank and the
    rank·frequency product (roughly constant under Zipf's law — a corpus
    whose head deviates wildly is boilerplate-dominated or template spam).
    One partial-aggregated term count + a 30-row TakeOrdered; the window
    only ranks the already-limited rows."""
    from pyspark.sql import Window

    from cassandra_util_spark.operators.text import _norm_tokens

    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(_norm_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(30)
    )
    w = Window.partitionBy(_cpk(F.col("term"))).orderBy(F.col("freq").desc(), F.col("term").asc())
    return freq.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "rank", "term", "freq", (F.col("rank") * F.col("freq")).cast("bigint").alias("rank_freq")
    )


@query(
    "lang_confusion_matrix",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id, lang AS declared,
        CASE
          WHEN en + de + fr + es = 0 THEN 'und'
          WHEN en >= de AND en >= fr AND en >= es THEN 'en'
          WHEN de >= fr AND de >= es THEN 'de'
          WHEN fr >= es THEN 'fr'
          ELSE 'es'
        END AS predicted
      FROM (
        SELECT doc_id, lang,
          len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS en,
          len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS de,
          len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une'], x))) AS fr,
          len(list_filter(toks, x -> list_contains(['el','los','las','y','es','una'], x))) AS es
        FROM (SELECT doc_id, lang,
                     list_transform({{TOKS}}, x -> lower(x)) AS toks
              FROM documents)))
    SELECT declared, predicted, count(*) AS n,
           (declared = predicted) AS agree
    FROM pred GROUP BY declared, predicted
    """.replace("{TOKS}", _TOKS_SQL),
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: declared metadata language vs the
    marker-stopword prediction, one cell per (declared, predicted) pair
    with an agreement flag — the audit that catches mislabeled feeds (a
    'de' source whose predictions skew 'en' is mislabeled or templated).
    One partial-aggregated groupBy; the matrix is |langs|² rows."""
    from cassandra_util_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("declared"),
            lang_id(F.col("text")).alias("predicted"),
        )
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("agree", F.col("declared") == F.col("predicted"))
    )


@query(
    "unicode_nfc_fingerprints",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' caf' || chr(101) || chr(769)
                  || ' r' || chr(101) || chr(769) || 'sum' || chr(101) || chr(769)
               AS t
      FROM documents)
    SELECT doc_id, nfc_normalize(t) AS text_nfc,
           md5(nfc_normalize(t)) AS nfc_fingerprint
    FROM aug
    """,
)
def unicode_nfc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization certified byte-for-byte: every document gets
    DECOMPOSED accent sequences appended (e + combining acute), the
    Arrow-batched normalizer collapses them to precomposed form, and both
    the full normalized text and its md5 hash-match DuckDB's
    nfc_normalize — the multilingual-dedup prerequisite proven, not
    assumed."""
    from cassandra_util_spark.operators.text import unicode_normalize_text

    d = _t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" caf"), F.lit("é"),
            F.lit(" r"), F.lit("é"), F.lit("sum"), F.lit("é"),
        ).alias("text"),
    )
    out = unicode_normalize_text(aug, "doc_id", "text", form="NFC")
    return out.select(
        "doc_id", "text_nfc", F.md5("text_nfc").alias("nfc_fingerprint")
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority split (TPC-H Q12 shape; the synthetic schema
    has no l_shipmode/commitdate, so "mode" is l_returnflag and "late" is
    shipped >60 days after order date).  The plan shape is the point: a
    non-equi residual predicate (l_shipdate vs o_orderdate+interval) rides
    ON TOP of the equi-join key, so the join stays a hash join on
    o_orderkey with the interval comparison evaluated as a post-join
    filter, then a 3-group conditional-count aggregate — integer counts,
    partitioning-exact.  At 100 TB both sides are big: this is the one
    TPC-H shape here that legitimately shuffles both inputs (AQE handles
    skewed order keys); counts are map-side partial."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate revenue (TPC-H Q19 shape, minus the absent
    p_container/l_shipmode columns).  The OR-of-ANDs mixes part-side and
    lineitem-side conjuncts; Catalyst factors the per-side implications out
    of the disjunction so the part scan prunes to the three brands and the
    lineitem scan gets the quantity-range union BEFORE the join, leaving
    only the cross-side residual on the hash join (verify with
    .explain: PushedFilters shows Or(...) on both scans).  Part broadcasts;
    revenue accumulates in DECIMAL so the sum is partitioning-exact, cast
    to double only at output."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(1, 35)
           & qty.between(20, 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    SELECT s_name, s_suppkey, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name, s_suppkey
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-late-supplier count (TPC-H Q21 shape; "kept the order waiting"
    is shipped >30 days after an 'F'-status order's date, standing in for
    the absent receipt/commit dates).  The semantics are Q21's exactly —
    supplier shipped late, SOME other supplier participated, NO other
    supplier was late — but instead of the textbook EXISTS + NOT EXISTS
    double self-join (three lineitem scans, three shuffles on the order
    key), both existence tests collapse into ONE window pass: after the
    orders⨝lineitem join shuffles on o_orderkey, a window partitioned by
    the SAME key computes the distinct-supplier set and the late-supplier
    set per order with zero additional exchange (the sort for the window
    rides the join's partitioning), and the predicates become n_supp >= 2
    AND late_supps == {me}.  Set sizes are bounded by suppliers-per-order
    (single digits), so window state is O(1) per order at 100 TB.  The
    supplier dimension broadcasts onto the survivors."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    j = (
        o.filter(F.col("o_orderstatus") == "F")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .alias("is_late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    ann = j.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        .alias("late_supps"),
    )
    sole_late = (
        ann.filter(
            F.col("is_late")
            & (F.col("n_supp") >= 2)
            & (F.size("late_supps") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        sole_late.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name", "s_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "runstore_leveled_view",
    oracle="""
    WITH runs AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS writetime FROM events
      UNION ALL
      SELECT user_id, event_type, event_id, epoch_us(ts) FROM events
      WHERE user_id <= 50
      UNION ALL
      SELECT user_id, event_type, event_id, epoch_us(ts) FROM events
      WHERE user_id BETWEEN 25 AND 75)
    SELECT user_id, event_type, event_id, writetime FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_id
               ORDER BY writetime DESC) AS rn
      FROM runs) WHERE rn = 1 AND user_id BETWEEN 25 AND 75
    """,
)
def runstore_leveled_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEVELED compaction end to end, driver-checked: three overlapping
    runs append as L0, leveled maintenance drains them into range-split
    non-overlapping L1 runs, and a BOUNDED read (user_id in [25, 75]) goes
    through the stats-pruned path — so the hash certifies the whole chain:
    range re-split, per-run stats, run pruning, and the LWW merge of
    whatever survives pruning.  The Spark analog of Cassandra's
    LeveledCompactionStrategy read path (one sstable per level per key
    range) under the reference's strategy-agnostic deleting wrapper."""
    import tempfile

    from cassandra_util_spark.sources.runs import RunStore, maintain

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .select("user_id", "event_type", "event_id", "writetime")
    )
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-lq-"),
        TableMeta(("user_id",), ("event_id",), "writetime"),
    )
    store.append_run(ev)
    store.append_run(ev.filter(F.col("user_id") <= 50))
    store.append_run(ev.filter(F.col("user_id").between(25, 75)))
    # target sized to the store so leveling splits into ~8 runs at ANY sf —
    # a fixed byte target would explode into hundreds of tiny runs at
    # larger scale factors and measure file-system churn, not the engine
    target = max(64 << 10, sum(store.run_sizes().values()) // 8)
    maintain(
        store, spark, strategy="leveled", min_threshold=2,
        run_target_bytes=target, vacuum_min_age_s=0.0,
    )
    return store.read_merged(spark, key_lower=25, key_upper=75).select(
        "user_id", "event_type", "event_id", "writetime"
    )


@query(
    "sketch_heavy_hitters",
    oracle=f"""
    WITH norm AS (SELECT {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    big AS (
      SELECT w[i] || ' ' || w[i + 1] AS bigram
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
      WHERE len(w) >= 2),
    tot AS (SELECT count(*) AS t FROM big),
    c AS (SELECT bigram, count(*) AS n FROM big GROUP BY bigram)
    SELECT bigram, n FROM c, tot
    WHERE n >= CAST(ceil(0.001 * t) AS BIGINT)
    """,
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters (φ=0.001) over corpus bigrams via the Count-Min
    pre-shuffle gate with exact verification — the sketch prunes the
    shuffle, the second pass restores exactness, so the oracle is a plain
    GROUP BY ... HAVING and must hash-match bit for bit.  The operator a
    vocabulary/boilerplate audit runs at 100 TB, where exact-counting the
    full n-gram tail is the cost and the Zipf head is the answer.
    Counterpart of the reference's per-scan observed-row statistics
    (DeletingCompactionStrategy's kept/dropped counters) generalized to
    frequency ranking."""
    from cassandra_util_spark.operators.sketches import heavy_hitters_exact
    from cassandra_util_spark.operators.text import normalize_text

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(normalize_text(F.col("text")), " "), lambda t: t != "")
    big = (
        d.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], ' ', t[i + 1]))"
                )
            ).alias("bigram")
        )
    )
    return heavy_hitters_exact(big, "bigram", phi=0.001, depth=4, width=1024)


@query(
    "events_incremental_rollup",
    oracle="""
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum,
           MIN(value) AS value_min,
           MAX(value) AS value_max
    FROM events GROUP BY 1, 2
    """,
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance certified against from-scratch
    aggregation: the event stream is split into three disjoint batches
    (event_id mod 3 — standing in for arrival days), each batch
    re-aggregates ALONE into a partial (day, event_type) rollup, and
    merge_rollups folds the three partials into one table touching only
    rollup-sized inputs.  The oracle aggregates all raw rows in one pass —
    the hash match IS the partial-aggregate closure theorem (sum/count
    merge by addition in order-independent DECIMAL, min/max by min/max),
    the property that lets a 100 TB pipeline maintain a persisted rollup
    by re-aggregating only each day's delta.  Reference anchor: per-scan
    observed counters folded across sstables
    (DeletingCompactionStrategy.java kept/dropped statistics)."""
    from cassandra_util_spark.operators.merge import merge_rollups

    ev = _t(spark, sf_dir, "events")

    def partial(batch: DataFrame) -> DataFrame:
        return (
            batch.groupBy(
                F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias(
                    "day_start"
                ),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(28,6)")).alias("value_sum"),
                F.min("value").alias("value_min"),
                F.max("value").alias("value_max"),
            )
        )

    parts = [partial(ev.filter(F.col("event_id") % 3 == i)) for i in range(3)]
    merged = merge_rollups(
        parts,
        ["day_start", "event_type"],
        {"n_events": "sum", "value_sum": "sum", "value_min": "min", "value_max": "max"},
    )
    return merged.select(
        "day_start",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("value_sum").cast("double").alias("value_sum"),
        "value_min",
        "value_max",
    )


_PJ_HASH_SQL = (
    "CAST(('0x' || substring(md5('pj:' || CAST(i AS VARCHAR) || ':' "
    "|| CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % 1024"
)


@query(
    "join_plan_advisory",
    oracle=f"""
    WITH d(i) AS (VALUES (0), (1), (2), (3)),
    cells_a AS (
      SELECT i AS row, {_PJ_HASH_SQL.format(key="o_custkey")} AS idx, count(*) AS c
      FROM orders, d GROUP BY 1, 2),
    cells_b AS (
      SELECT i AS row, {_PJ_HASH_SQL.format(key="c_custkey")} AS idx, count(*) AS c
      FROM customer, d GROUP BY 1, 2),
    na AS (SELECT CAST(SUM(c) AS BIGINT) AS n_a FROM cells_a WHERE row = 0),
    nb AS (SELECT CAST(SUM(c) AS BIGINT) AS n_b FROM cells_b WHERE row = 0),
    mxa AS (SELECT CAST(MIN(m) AS BIGINT) AS max_key_est_a
            FROM (SELECT row, MAX(c) AS m FROM cells_a GROUP BY row)),
    mxb AS (SELECT CAST(MIN(m) AS BIGINT) AS max_key_est_b
            FROM (SELECT row, MAX(c) AS m FROM cells_b GROUP BY row)),
    ip AS (SELECT CAST(MIN(p) AS BIGINT) AS join_size_estimate FROM (
      SELECT a.row, SUM(a.c * b.c) AS p
      FROM cells_a a JOIN cells_b b ON a.row = b.row AND a.idx = b.idx
      GROUP BY a.row))
    SELECT n_a, n_b, join_size_estimate, max_key_est_a, max_key_est_b,
      CASE
        WHEN n_b <= 1000000 AND n_b <= n_a THEN 'broadcast_b'
        WHEN n_a <= 1000000 THEN 'broadcast_a'
        WHEN max_key_est_a * 16 >= n_a OR max_key_est_b * 16 >= n_b
          THEN 'shuffle_salted'
        ELSE 'shuffle'
      END AS advice
    FROM na, nb, mxa, mxb, ip
    """,
)
def join_plan_advisory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven join planning (VERDICT r4 task 7): decide
    broadcast/shuffle/salt for orders ⨝ customer from two Count-Min
    sketches, before running the join.  Every number is exact-integer
    sketch arithmetic (portable md5 family), so the advisory — including
    the advice string itself — is hash-pinned by the oracle.  At sf0.1 the
    advice ("broadcast_b", customer side) matches what AQE chooses at
    runtime for every customer join in the TPC-H suite (PLANS.md).
    Reference anchor: the reference sizes its scan/compaction work from
    per-sstable metadata before touching data (SSTableReader estimated
    keys, CassandraTableScanRDD split sizing); this is that discipline
    applied to Spark join strategy."""
    from cassandra_util_spark.operators.sketches import plan_join

    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return plan_join(o, c, "k")


# ---------------------------------------------------------------------------
# Driver-window curation (round 5).
#
# The driver's hard correctness gate covers the FIRST 50 registered queries;
# everything past that is certified only by the builder's local (identical-
# methodology) oracle.  Registration order is source order, which through
# round 4 spent window rows on near-trivial variants (odd_pk_filter,
# paged_fetch, ...) while entire operator families — sketches, the LSM run
# store, connected components, winnowing, BM25, sequence packing, the full
# assembly pipeline — had no driver row at all (VERDICT r4, task 2).
#
# This block deliberately re-orders the registry ONCE, at import time, after
# all registration: ten family-representative queries move into the 50-row
# window and ten near-trivial or variant queries move just past it (they keep
# their full-strength local oracles and tests; nothing is removed).  The
# pinned prefix snapshot in tests/test_plan_hygiene.py is updated in the same
# commit, as that test's docstring sanctions.
_WINDOW_SWAP_IN = [
    "dedup_clusters_star",       # connected components / star contraction
    "training_corpus_assembly",  # six-stage composed pipeline
    "sketch_heavy_hitters",      # CM-sketch-gated exact heavy hitters
    "runstore_leveled_view",     # LSM run store, leveled compaction read
    "dedup_incremental_lsh",     # persisted-band-index incremental LSH
    "bm25_search",               # retrieval family
    "sequence_packing",          # packing family
    "dedup_winnowing",           # winnowing fingerprints (MOSS)
    "events_funnel",             # ordered-event CEP (batch form)
    "contamination_report",      # decontamination overlap report
]
_WINDOW_SWAP_OUT = [
    "odd_pk_filter",             # parity filter: token_range_filter covers it
    "writetime_projection",      # trivial projection
    "paged_fetch",               # limit/offset paging
    "token_count_regex",         # map-only regex count
    "orders_profile",            # simple profile: q1 covers aggregation
    "dedup_fingerprint",         # variant of dedup_exact (still local-green)
    "dedup_ngram_jaccard_capped",  # variant of dedup_ngram_jaccard
    "media_frame_plan",          # media_features/media_dedup stay in-window
    "orders_status_rollup",      # simple rollup: q1/q4 cover it
    "events_json_props",         # scalar JSON extraction
]


def _curate_driver_window() -> None:
    names = list(QUERIES)
    missing = [n for n in _WINDOW_SWAP_IN + _WINDOW_SWAP_OUT if n not in QUERIES]
    if missing:  # loud: a renamed query must update this list, not skip it
        raise AssertionError(f"window curation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_SWAP_OUT)]
    prefix += _WINDOW_SWAP_IN
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    # displaced queries land immediately after the window, keeping their
    # relative order; all other queries keep registration order
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_curate_driver_window()


# ---------------------------------------------------------------------------
# Round 5: the five TPC-H shapes missing from the suite (q2, q9, q11, q16,
# q20), adapted to this testdata's schema — there is no partsupp table, so
# each query re-expresses its ORIGINAL join/agg shape (correlated min,
# multi-dim profit rollup, global-scalar HAVING, NOT-IN + count-distinct,
# nested semi-join) over the supplier linkage that DOES exist: the distinct
# (l_partkey, l_suppkey) pairs of lineitem.  Appended AFTER the curation
# block: registration order past position 50 only affects listing order.


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH small_parts AS (
      SELECT p_partkey, p_type, p_retailprice FROM part WHERE p_size < 25),
    min_price AS (
      SELECT p_type, MIN(p_retailprice) AS mn FROM small_parts GROUP BY p_type),
    cheapest AS (
      SELECT sp.p_partkey, sp.p_type, sp.p_retailprice
      FROM small_parts sp JOIN min_price m
        ON sp.p_type = m.p_type AND sp.p_retailprice = m.mn),
    supplies AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, p_retailprice
    FROM cheapest
    JOIN supplies ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): the correlated-min subquery —
    parts priced at the MINIMUM retail price of their type — joined back to
    the suppliers of one region.  The correlated subquery becomes a
    broadcast of the tiny per-type min table; supplier linkage is the
    distinct (l_partkey, l_suppkey) projection (no partsupp in this
    schema).  Region/nation/min-table all broadcast; the only shuffle is
    the distinct over the two join keys."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") < 25).select(
        "p_partkey", "p_type", "p_retailprice"
    )
    mn = p.groupBy("p_type").agg(F.min("p_retailprice").alias("mn")).select(
        F.col("p_type").alias("mn_type"), "mn"
    )
    cheapest = p.join(
        F.broadcast(mn),
        (F.col("p_type") == F.col("mn_type")) & (F.col("p_retailprice") == F.col("mn")),
    ).select("p_partkey", "p_type", "p_retailprice")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(F.broadcast(cheapest), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "p_retailprice")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(volume) AS DOUBLE)
             - 0.0625 * CAST(SUM(retail_qty) AS DOUBLE) AS profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS retail_qty
      FROM lineitem, part, supplier, orders, nation
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey AND n_nationkey = s_nationkey
        AND p_name LIKE '%gear%')
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape): a 5-table
    join with a LIKE-filtered part side feeding a two-term profit rollup.
    Supply cost is adapted to p_retailprice/16 per unit (no partsupp):
    both terms accumulate as exact DECIMAL sums and the 1/16 scaling is a
    power of two, so the final double arithmetic is bit-deterministic under
    any partitioning.  part/supplier/nation broadcast; lineitem⨝orders is
    the one big shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    retail_qty = F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            retail_qty.alias("retail_qty"),
        )
    )
    agg = joined.groupBy("nation", "o_year").agg(
        F.sum("volume").alias("sv"), F.sum("retail_qty").alias("sr")
    )
    return agg.select(
        "nation",
        "o_year",
        (
            F.col("sv").cast("double") - F.lit(0.0625) * F.col("sr").cast("double")
        ).alias("profit"),
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH supplied AS (
      SELECT l_partkey,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS val
      FROM lineitem, supplier, nation
      WHERE s_suppkey = l_suppkey AND n_nationkey = s_nationkey
        AND n_name = 'NATION_7'),
    per_part AS (SELECT l_partkey, SUM(val) AS value FROM supplied GROUP BY l_partkey),
    stats AS (SELECT SUM(value) AS tot, COUNT(*) AS np FROM per_part)
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM per_part, stats WHERE value * np > 2 * tot
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): per-part value for
    one nation's suppliers, kept only when it exceeds TWICE THE MEAN
    per-part value — the global-scalar HAVING that needs the whole
    aggregate before any row can pass.  The (total, n_parts) scalar is a
    1-row broadcast cross-join; the threshold compares value·n > 2·total
    in exact DECIMAL (no float fraction), so the cut is partitioning-exact
    AND scale-stable (a fixed fraction-of-total, TPC-H's 0.0001/SF, empties
    out as part cardinality grows with scale).  Value is adapted to
    extendedprice*quantity (no partsupp availqty/supplycost)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supplied = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "l_partkey",
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(18,2)")
            ).alias("val"),
        )
    )
    per_part = supplied.groupBy("l_partkey").agg(F.sum("val").alias("value"))
    stats = per_part.agg(
        F.sum("value").alias("tot"), F.count(F.lit(1)).alias("np")
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .filter(F.col("value") * F.col("np") > F.col("tot") * 2)
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "q16_parts_supplier_relation",
    oracle="""
    WITH ok_suppliers AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0),
    pairs AS (
      SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
      FROM part JOIN lineitem ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        AND l_suppkey IN (SELECT s_suppkey FROM ok_suppliers))
    SELECT p_brand, p_type, p_size, COUNT(*) AS supplier_cnt
    FROM pairs GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): count of DISTINCT
    suppliers per (brand, type, size) with a supplier exclusion — here the
    'complaints' analog is suppliers with negative account balance.  Both
    the engine and the oracle keep only suppkeys IN the s_acctbal >= 0 set
    (a broadcast LEFT SEMI join), the SAME polarity on both sides: an
    anti-join against the negative set would ALSO keep suppkeys that are
    missing from supplier or have NULL acctbal, which only coincides with
    the semi-join under full referential integrity (ADVICE r5).  The
    distinct-before-count is explicit so the exact-distinct shuffle
    carries only the four group columns plus suppkey."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ok = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0).select(
        "s_suppkey"
    )
    pairs = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(ok),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


@query(
    "q20_potential_promotion",
    oracle="""
    WITH promo_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    usage AS (
      SELECT l_suppkey,
             SUM(CASE WHEN year(l_shipdate) = 1996
                      THEN CAST(l_quantity AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1996,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total
      FROM lineitem JOIN promo_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey),
    candidates AS (
      SELECT l_suppkey FROM usage WHERE qty_1996 * 5 > qty_total)
    SELECT s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (SELECT l_suppkey FROM candidates)
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): the nested semi-join —
    suppliers qualify through an aggregate threshold over their own
    shipments (1996 quantity of promo-named parts exceeding a fifth of their
    all-time quantity, adapting availqty > 0.5·qty without partsupp), then
    filter to one region.  The candidate set is a LEFT SEMI broadcast into
    supplier; the threshold compares exact DECIMAL sums (qty·5 > total),
    so qualification is partitioning-exact."""
    li = _t(spark, sf_dir, "lineitem")
    promo = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    usage = (
        li.join(F.broadcast(promo), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1996, qty).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).alias("qty_1996"),
            F.sum(qty).alias("qty_total"),
        )
    )
    candidates = usage.filter(F.col("qty_1996") * 5 > F.col("qty_total")).select(
        "l_suppkey"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(
            F.broadcast(candidates),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal", "n_name")
    )


_CSPLIT_GATE = _sample_gate_sql("cluster", "split")


@query(
    "cluster_aware_split",
    oracle=f"""{_CLUSTERS_CTE}
    SELECT doc_id, cluster,
           CASE WHEN {_CSPLIT_GATE} < {_SPLIT_T1} THEN 'train'
                WHEN {_CSPLIT_GATE} < {_SPLIT_T2} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster
          FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
    """,
)
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val/test split: the deterministic 90/5/5 gate of
    ``corpus_split_assignment`` applied to the NEAR-DUP CLUSTER label
    instead of the document id, so every member of a duplicate cluster
    lands in the same split.  This is the composition a benchmark-honest
    training pipeline needs: splitting by raw doc id lets near-duplicates
    straddle train and test, silently inflating eval scores — exactly the
    contamination the decontamination operator hunts AFTER the fact; the
    cluster-keyed gate prevents it BY CONSTRUCTION.  Clusters come from the
    same Jaccard-pair transitive closure as ``dedup_clusters`` (oracle:
    recursive CTE + the identical hash gate on the component label), so the
    full pipeline — pairs → components → split — is hash-certified end to
    end.  Scale: the gate itself is map-only over the cluster table; cost
    is the clustering, which the corpus pays once and persists."""
    from cassandra_util_spark.operators.cluster import resolve_duplicates
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs
    from cassandra_util_spark.operators.sampling import corpus_splits

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    clusters = resolve_duplicates(d, pairs, "doc_id").select("doc_id", "cluster")
    return corpus_splits(
        clusters, "cluster", {"train": 0.90, "val": 0.05, "test": 0.05}
    )


# ---------------------------------------------------------------------------
# Round 6: the join advisory made an executor, plus counter-store and
# gate-from-store surface.  Appended after the curation block.


@query(
    "advised_join_exec",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def advised_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through :func:`~cassandra_util_spark.
    operators.sketches.advised_join` — the sketch advisory EXECUTING the
    join it recommends (VERDICT r5 task 3), not just reporting.  At every
    tested SF the advice is ``broadcast_b`` (customer fits the threshold),
    so the plan is one scan of each side for the sketches plus a broadcast
    hash join — and if the data shape ever changed, the same call would
    route to a salted or plain shuffle with identical rows (pinned by
    ``test_advised_join_every_branch_row_identical``).  The oracle is the
    plain join: the advisory changes the physical strategy, never the
    answer.  Sums are exact DECIMAL(18,2) partials, so the total is
    partitioning-invariant.  Reference anchor: CQLBatch.scala:56-67
    (work routed by data shape decided before execution)."""
    from cassandra_util_spark.operators.sketches import advised_join

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    return (
        advised_join(o, c, "k")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-window rotation, round 6 (VERDICT r5, task 1).
#
# Certification rotates: ten rows that are now DRIVER-certified twice
# (CORRECTNESS_r04 ∩ r05) move just past the window — keeping their
# full-strength local oracles and tests — in favor of the highest-value
# queries the driver has never checked: the reference's actual deletion
# life-cycle (tombstone_compaction, FilteringOnDiskAtomIterator.java:69-111),
# CDC apply, the biggest new TPC-H join shape (q9), retrieval fusion,
# DSIR selection, the leakage-proof cluster split, the Bloom incremental
# dedup path, incremental rollup maintenance, the join advisory, and
# Unicode-normalized fingerprints.  Window family coverage is preserved:
# retention keeps rules/ttl/configurable, text keeps text_quality, events
# keeps hourly/sessionize/funnel, dedup keeps ngram/minhash/winnowing/
# incremental-LSH/clusters, embeddings keep neardup/resolve/ivf/semantic.
# The pinned prefix snapshot in tests/test_plan_hygiene.py is updated in
# the same commit, as that test's docstring sanctions.
_WINDOW_ROTATE_OUT_R6 = [
    "dedup_exact",               # certified r4+r5; dedup family still 5-deep
    "dedup_simhash",             # certified r4+r5
    "doc_fingerprint",           # certified r4+r5 (VERDICT-named)
    "lang_id",                   # certified r4+r5 (VERDICT-named)
    "embedding_quantize",        # certified r4+r5 (VERDICT-named)
    "ann_cosine_topk",           # certified r4+r5; ann_ivf_topk stays
    "set_ops_except_intersect",  # certified r4+r5 (VERDICT-named)
    "retention_rules_antijoin",  # certified r4+r5; 3 retention rows stay
    "retention_ttl_mixed_keys",  # certified r4+r5 (variant of retention_ttl)
    "events_user_gaps",          # certified r4+r5; 3 events rows stay
]
_WINDOW_ROTATE_IN_R6 = [
    "cdc_apply",
    "tombstone_compaction",
    "q9_product_type_profit",
    "hybrid_retrieval_rrf",
    "dsir_select",
    "cluster_aware_split",
    "dedup_incremental",
    "events_incremental_rollup",
    "join_plan_advisory",
    "unicode_nfc_fingerprints",
]


def _rotate_driver_window_r6() -> None:
    names = list(QUERIES)
    missing = [
        n for n in _WINDOW_ROTATE_IN_R6 + _WINDOW_ROTATE_OUT_R6 if n not in QUERIES
    ]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_ROTATE_OUT_R6)]
    prefix += _WINDOW_ROTATE_IN_R6
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r6()


@query(
    "counter_store_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS DOUBLE) AS hits,
           CAST(SUM(CAST(event_id AS DECIMAL(28,6))) AS DOUBLE) AS id_sum
    FROM events GROUP BY user_id
    """,
)
def counter_store_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-writer counter table end to end, hash-certified: three
    disjoint delta batches (event_id mod 3 splits of the events table,
    pre-aggregated per user) append to a
    :class:`~cassandra_util_spark.operators.counters.CounterStore` as
    additive runs — no writer ever reads a total — with a compaction FOLD
    interleaved after the second append; the totals view must equal one
    flat aggregation over all events.  This certifies the whole loss-free
    counter chain: append-only deltas, decimal merge-on-read, and
    fold-invariance under compaction (addition's associativity is the
    whole correctness argument, and the hash pins it).  Reference anchor:
    CQLBatch.scala:284-336 — Cassandra counter batches ship increments
    merged server-side per cell; this is that shape on files."""
    import tempfile

    from cassandra_util_spark.operators.counters import CounterStore

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id")
    cs = CounterStore(
        tempfile.mkdtemp(prefix="counters-q-"), ["user_id"], ["hits", "id_sum"]
    )
    for i in range(3):
        batch = (
            ev.filter(F.col("event_id") % 3 == i)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("hits"),
                F.sum(F.col("event_id").cast("decimal(28,6)")).alias("id_sum"),
            )
        )
        cs.append_increments(batch)
        if i == 1:
            cs.compact(spark)
    return cs.totals(spark)


@query(
    "zorder_layout_key",
    oracle="""
    WITH stats AS (
      SELECT MIN(l_orderkey) AS mno, MAX(l_orderkey) AS mxo,
             MIN(l_partkey) AS mnp, MAX(l_partkey) AS mxp
      FROM lineitem),
    b AS (
      SELECT l_orderkey, l_linenumber,
             ((l_orderkey - mno) * 65535) // GREATEST(mxo - mno, 1) AS ba,
             ((l_partkey - mnp) * 65535) // GREATEST(mxp - mnp, 1) AS bb
      FROM lineitem, stats),
    c1 AS (SELECT l_orderkey, l_linenumber,
             (ba | (ba << 8)) & 16711935 AS sa, (bb | (bb << 8)) & 16711935 AS sb FROM b),
    c2 AS (SELECT l_orderkey, l_linenumber,
             (sa | (sa << 4)) & 252645135 AS sa, (sb | (sb << 4)) & 252645135 AS sb FROM c1),
    c3 AS (SELECT l_orderkey, l_linenumber,
             (sa | (sa << 2)) & 858993459 AS sa, (sb | (sb << 2)) & 858993459 AS sb FROM c2),
    c4 AS (SELECT l_orderkey, l_linenumber,
             (sa | (sa << 1)) & 1431655765 AS sa, (sb | (sb << 1)) & 1431655765 AS sb FROM c3)
    SELECT l_orderkey, l_linenumber, CAST(sa | (sb << 1) AS BIGINT) AS zvalue
    FROM c4
    """,
)
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) layout key over (l_orderkey, l_partkey) — the
    multi-column data-skipping sort key, hash-certified bit for bit: the
    oracle replays the identical exact-integer bucket arithmetic and
    shift-mask dilation cascade in SQL, so every interleaved bit of every
    row is pinned.  ``write_zordered`` range-partitions on this key so each
    parquet file covers a compact rectangle in (orderkey, partkey) space —
    footer min/max stats then prune selective filters on EITHER column
    (test_zorder_layout_prunes_on_every_column measures it against a
    single-column sort, which cannot prune the second column at all).
    Pure expressions over one broadcast stats row; no shuffle until the
    layout write itself."""
    from cassandra_util_spark.operators.zorder import zorder_key

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    return zorder_key(li, ["l_orderkey", "l_partkey"], bits=16).select(
        "l_orderkey", "l_linenumber", "zvalue"
    )


@query(
    "runstore_skipindex_view",
    oracle="""
    WITH runs AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS writetime,
             user_id % 4 AS shard
      FROM events)
    SELECT user_id, event_id, event_type, writetime, shard FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_id
               ORDER BY writetime DESC) AS rn
      FROM runs) WHERE rn = 1 AND shard = 2
    """,
)
def runstore_skipindex_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-run SKIP INDEX read path, hash-certified: events land in
    the store as four shard-disjoint runs (a non-key column carries the
    shard id), and a bounded read on that NON-KEY column prunes three of
    the four runs ENTIRELY via their per-column min/max stats before any
    scan — the ClickHouse-minmax / Iceberg-manifest data-skipping shape on
    the LSM store, asserted inside the query (pruning is part of the
    certified behavior, not just the values).  The surviving run still
    merges through the normal LWW path.  Reference anchor: the reference
    prunes sstables by key range before scanning
    (FilteringSSTableScanner.java:95-124); this extends that elimination
    to any stats-covered column."""
    import tempfile

    from cassandra_util_spark.sources.runs import RunStore

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .withColumn("shard", F.col("user_id") % 4)
        .select("user_id", "event_id", "event_type", "writetime", "shard")
    )
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-skip-"),
        TableMeta(("user_id",), ("event_id",), "writetime"),
    )
    for s in range(4):
        store.append_run(ev.filter(F.col("shard") == s))
    pruned = store.prune_runs(2, 2, column="shard")
    assert len(pruned) == 1, pruned  # the skip index is the contract
    return store.read_merged(spark, extra_bounds={"shard": (2, 2)})


@query(
    "twcs_retention_view",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS writetime
      FROM events),
    s AS (SELECT MIN(writetime) AS mn,
                 (MAX(writetime) - MIN(writetime)) // 4 + 1 AS win FROM e)
    SELECT user_id, event_id, event_type, writetime
    FROM e, s WHERE (writetime - mn) // win >= 2
    """,
)
def twcs_retention_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window compaction + whole-window expiry end to end,
    hash-certified: events land as TWO runs per quarter-span time window
    (split by event-id parity), one ``maintain(strategy="twcs")`` cycle
    compacts each closed window with its contemporaries and DROPS the two
    fully-expired windows manifest-only — zero rows scanned for the
    expiry, the Cassandra fully-expired-sstable drop that makes TWCS the
    production pairing for the reference's deleting compaction
    (DeletingCompactionStrategy.java:102-126 delegates bucketing to the
    wrapped strategy).  The oracle is the pure time-range filter the
    surviving windows imply; run/window arithmetic is exact-integer on
    both sides.  The two span-derived scalars collected to the driver are
    1-row bounded aggregates (the O(K) discipline)."""
    import tempfile

    from cassandra_util_spark.sources.runs import RunStore, maintain

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .select("user_id", "event_id", "event_type", "writetime")
    )
    row = ev.agg(F.min("writetime").alias("mn"), F.max("writetime").alias("mx")).collect()[0]
    mn, win = row["mn"], (row["mx"] - row["mn"]) // 4 + 1
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-twcs-"),
        TableMeta(("user_id",), ("event_id",), "writetime"),
    )
    for w in range(4):
        in_window = ev.filter(F.expr(f"(writetime - {mn}) div {win}") == w)
        store.append_run(in_window.filter(F.col("event_id") % 2 == 0))
        store.append_run(in_window.filter(F.col("event_id") % 2 == 1))
    maintain(
        store,
        spark,
        strategy="twcs",
        time_col="writetime",
        window_us=win,
        min_threshold=2,
        expire_before=mn + 2 * win,
        vacuum_min_age_s=0.0,
    )
    return store.read_merged(spark)


# ---------------------------------------------------------------------------
# Round 7: z-order unified with the run store, scale-safe semantic dedup,
# and the streaming TWCS cycle as a certified query (VERDICT r6 tasks 3-5)
# ---------------------------------------------------------------------------

@query(
    "runstore_zorder_2d",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS writetime,
             user_id % 256 AS ux, event_id % 256 AS ex
      FROM events),
    s AS (SELECT MIN(writetime) AS mn,
                 (MAX(writetime) - MIN(writetime)) // 4 + 1 AS win FROM e)
    SELECT user_id, event_id, event_type, writetime, ux, ex
    FROM e, s
    WHERE (writetime - mn) // win >= 2 AND ux <= 63 AND ex <= 63
    """,
)
def runstore_zorder_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout UNIFIED with the run store (VERDICT r6 task 4): four
    quarter-span time runs land via ``append_run(zorder_by=["ux","ex"])``,
    and a 3-D bounded read then prunes at BOTH granularities — the
    per-run skip index eliminates two whole runs on the time bound
    (driver-side metadata, zero scan), and inside each surviving run the
    Morton file layout gives every file a compact rectangle in (ux, ex)
    space, so the 2-D conjunction skips files on EACH dimension
    independently (asserted from the parquet footer stats — the pruning
    is part of the certified behavior, not just the values).  The oracle
    is the pure 3-predicate filter the surviving layout implies; window
    arithmetic is exact-integer on both sides, and the span scalars are
    one bounded 1-row aggregate (the O(K) discipline).  Reference anchor:
    the reference prunes sstables along their single clustering dimension
    (FilteringSSTableScanner.java:95-124, DeletingCompactionStrategy.java:
    102-126 delegating scan choice to the layout-aware strategy); the
    z-ordered run generalizes that elimination to two columns at once."""
    import tempfile

    from cassandra_util_spark.operators.zorder import zorder_file_stats
    from cassandra_util_spark.sources.runs import RunStore

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .withColumn("ux", F.col("user_id") % 256)
        .withColumn("ex", F.col("event_id") % 256)
        .select("user_id", "event_id", "event_type", "writetime", "ux", "ex")
    )
    row = ev.agg(F.min("writetime").alias("mn"), F.max("writetime").alias("mx")).collect()[0]
    mn, win = row["mn"], (row["mx"] - row["mn"]) // 4 + 1
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-z2d-"),
        TableMeta(("user_id",), ("event_id",), "writetime"),
    )
    for w in range(4):
        store.append_run(
            ev.filter(F.expr(f"(writetime - {mn}) div {win}") == w),
            zorder_by=["ux", "ex"],
            zorder_files=8,
        )
    # run-level pruning: the time bound eliminates the two old runs via the
    # skip index before any scan
    cut = mn + 2 * win
    pruned = store.prune_runs(cut, None, column="writetime")
    assert len(pruned) == 2, pruned
    # file-level pruning: inside each surviving run the Morton layout must
    # let EACH z-dimension eliminate files on its own, and the 2-D
    # conjunction must touch a strict minority of the run's files
    import os as _os

    for r in pruned:
        st = zorder_file_stats(_os.path.join(store.root, r), ["ux", "ex"])
        ux_skip = [f for f in st if f["ux_min"] > 63]
        ex_skip = [f for f in st if f["ex_min"] > 63]
        hit = [f for f in st if f["ux_min"] <= 63 and f["ex_min"] <= 63]
        assert ux_skip and ex_skip, st
        assert len(hit) < len(st), st
    return store.read_merged(
        spark,
        extra_bounds={"writetime": (cut, None), "ux": (None, 63), "ex": (None, 63)},
    )


@query(
    "semantic_dedup_scaled",
    oracle="""
    WITH RECURSIVE
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
      LIMIT (SELECT greatest(2, count(*) // 16) FROM corpus)),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(CASE WHEN isnan(list_cosine_similarity(c.v, s.cv))
                                     THEN 0 ELSE list_cosine_similarity(c.v, s.cv)
                                END, 4) DESC, s.cell ASC) AS rn
        FROM corpus c CROSS JOIN seeds s) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(root) AS comp FROM reach GROUP BY id)
    SELECT c.vec_id,
           coalesce(cm.comp, c.vec_id) AS cluster,
           c.vec_id = coalesce(cm.comp, c.vec_id) AS keep
    FROM corpus c LEFT JOIN comp cm ON cm.id = c.vec_id
    """,
)
def semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE semantic-dedup configuration, hash-certified
    (VERDICT r6 task 3): ``num_centroids`` follows the corpus —
    K = max(2, N/16) — instead of the fixed K=16 the original contract
    query pins for its oracle.  SCALING.md measured fixed-K as the one
    superlinear stage in the suite (Σ|cell|² grows quadratically when K
    stands still; K∝n restored the linear regime, 2.2× faster at 10×
    data), so this is the configuration users should actually run at
    corpus scale, now under the same DuckDB hash oracle as the K=16 row:
    the oracle's LIMIT is the identical count-derived K (a subquery —
    exact at every scale factor), and seed selection, argmax assignment,
    in-cell pair scoring, and transitive closure replay bit-identically.
    The count that sizes K on the Spark side is one bounded 1-row
    aggregate."""
    from cassandra_util_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    return semantic_dedup(
        e, "vec_id", "embedding",
        num_centroids=max(2, n // 16), threshold=0.4, refine_iters=0,
    )


@query(
    "twcs_streaming_view",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS writetime
      FROM events),
    s AS (SELECT MIN(writetime) AS mn, MAX(writetime) AS mx,
                 (MAX(writetime) - MIN(writetime)) // 4 + 1 AS win FROM e),
    w AS (SELECT (writetime - mn) // win AS wid, MAX(writetime) AS wmax
          FROM e, s GROUP BY 1),
    live AS (SELECT wid FROM w, s WHERE wmax >= mx - 2 * win)
    SELECT user_id, event_id, event_type, writetime
    FROM e, s
    WHERE (writetime - mn) // win IN (SELECT wid FROM live)
    """,
)
def twcs_streaming_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming TWCS life-cycle as one certified query (VERDICT
    r6 task 5): events replay through a REAL Structured Streaming source
    (file source, one quarter-span micro-batch per trigger) into
    ``stream_to_runstore(strategy="twcs", retention_us=2·win)``;
    maintenance interleaves every second batch, window-compacts closed
    windows with their contemporaries, and the expiry cutoff TRACKS EVENT
    TIME — ``max(writetime over run stats) − retention`` from the per-run
    skip index, so each aged window leaves by manifest swap with zero
    rows scanned.  The oracle replays the exact expiry rule: a window
    survives iff its OBSERVED max event time is ≥ final-cutoff (windows
    whose data never reaches the cutoff frontier age out even when their
    nominal span straddles it).  End-state determinism does not depend on
    batch arrival order: a window's data arrives in exactly one batch, a
    window dropped at an intermediate cycle satisfies the final rule too
    (intermediate cutoffs only lag the final one), and the final
    maintenance cycle applies the global cutoff.  Reference anchor:
    Cassandra TWCS + fully-expired-sstable drop is the production pairing
    for the reference's deleting compaction
    (DeletingCompactionStrategy.java:102-126 delegates bucketing to the
    wrapped strategy); the streaming drain models its flush cadence."""
    import tempfile

    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.ingest import stream_to_runstore

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("writetime", writetime_micros(F.col("ts")))
        .select("user_id", "event_id", "event_type", "writetime")
    )
    row = ev.agg(F.min("writetime").alias("mn"), F.max("writetime").alias("mx")).collect()[0]
    mn, win = row["mn"], (row["mx"] - row["mn"]) // 4 + 1
    src = tempfile.mkdtemp(prefix="twcs-stream-src-")
    for w in range(4):  # one quarter-span file per micro-batch
        (
            ev.filter(F.expr(f"(writetime - {mn}) div {win}") == w)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-twcs-stream-"),
        TableMeta(("user_id",), ("event_id",), "writetime"),
    )
    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, event_type string, writetime bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_to_runstore(
        stream,
        store,
        tempfile.mkdtemp(prefix="twcs-stream-cp-"),
        maintain_every=2,
        strategy="twcs",
        min_threshold=2,
        time_col="writetime",
        window_us=win,
        retention_us=2 * win,
    )
    q.awaitTermination(300)
    return store.read_merged(spark)


@query(
    "dedup_ngram_prefix",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
    """,
)
def dedup_ngram_prefix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard (AllPairs/PPJoin): candidates only from
    each document's rarest (1-t)*|doc|+1 shingles under a global
    rarity order, every survivor re-verified against the full shingle sets
    — so the oracle is the UNCAPPED Jaccard SQL, verbatim: lossless
    candidate pruning, not a metric change.  This is the exact-mode scale
    path (hot shingles never enter candidate generation); measured at
    sf0.1 it joins 3.9x fewer rows than the plain shingle self-join, and
    the gap widens with Zipfian shingle skew.  The df-capped mode stays
    the right choice when approximate stop-shingle semantics are wanted;
    this one is for when the answer must equal the uncapped metric."""
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs_prefix

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_prefix(d, "doc_id", "text", n=3, threshold=0.5)


@query(
    "jaccard_route_advisory",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)),
    d(i) AS (VALUES (0), (1), (2), (3)),
    cells AS (
      SELECT i AS row,
             CAST(('0x' || substring(md5('jacroute:' || CAST(i AS VARCHAR)
                                         || ':' || sh), 1, 8)) AS BIGINT)
               % 65536 AS idx,
             count(*) AS c
      FROM sh, d GROUP BY 1, 2),
    per_row AS (
      SELECT row, SUM(c) AS nr, SUM(CAST(c AS HUGEINT) * c) AS f2r
      FROM cells GROUP BY row),
    est AS (SELECT CAST(MAX(nr) AS BIGINT) AS shingle_rows,
                   CAST(MIN(f2r) AS DOUBLE) AS f2_raw FROM per_row),
    blow AS (
      SELECT shingle_rows,
             round(greatest((f2_raw - CAST(shingle_rows AS DOUBLE)
                                       * shingle_rows / 65536.0)
                              / (1.0 - 1.0 / 65536.0),
                            CAST(shingle_rows AS DOUBLE))
                   / shingle_rows, 6) AS selfjoin_blowup
      FROM est)
    SELECT shingle_rows, selfjoin_blowup,
           CASE WHEN selfjoin_blowup > 24.0 THEN 'prefix'
                ELSE 'selfjoin' END AS route
    FROM blow
    """,
)
def jaccard_route_advisory_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-Jaccard pair-generator ROUTER's advisory, hash-certified:
    one Count-Min sketch build over the shingle stream (4×65536 counters,
    portable md5 hashes — every counter reproducible in any engine), then
    the compensated AMS/CM self-join size estimate ``F2_est / N`` =
    candidate rows per shingle row.  SCALING.md measures a two-regime
    world (self-join wins bounded-df corpora, prefix filtering wins
    Zipf/boilerplate by 3.4x-and-growing); this advisory decides the
    regime BEFORE any pair is generated — the sketch-advisory→executor
    pattern of ``advised_join``, applied to dedup.  The driver corpus
    profiles at blowup 2.06 (sf0.01) / 10.64 (sf0.1) → ``selfjoin``; the
    routing pytest pins a boilerplate fixture switching to ``prefix``
    with the identical output hash either way."""
    from cassandra_util_spark.operators.dedup import jaccard_route_advice

    d = _t(spark, sf_dir, "documents")
    return jaccard_route_advice(d, "doc_id", "text", n=3)


@query(
    "dedup_jaccard_routed",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
    """,
)
def dedup_jaccard_routed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard with the pair generator CHOSEN by the measured
    shingle-df profile (``ngram_jaccard_pairs_auto``): the 1-row CM
    advisory above is collected (bounded by construction) and dispatches
    to the shingle self-join or the prefix filter.  The oracle is the
    uncapped Jaccard SQL verbatim — identical to ``dedup_ngram_prefix``'s
    — because BOTH routes compute the same lossless metric; together the
    two queries hash-certify both physical routes.  On the driver corpus
    this takes the self-join route (blowup 2.06 < 24); the pytest pins
    the switch.  A user no longer needs to know their corpus's shingle
    skew to get the fast exact-dedup plan — the engine measures it."""
    from cassandra_util_spark.operators.dedup import ngram_jaccard_pairs_auto

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_auto(d, "doc_id", "text", n=3, threshold=0.5)


@query(
    "dedup_streaming_lsh",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)),
    h AS (SELECT doc_id, {_p31('sh')} AS h FROM sh),
    sig AS (
      SELECT doc_id, p.j, min((p.a * h.h + p.b) % 2147483647) AS v
      FROM h CROSS JOIN {_minhash_params_sql(64)}
      GROUP BY doc_id, p.j),
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS bucket
      FROM sig GROUP BY doc_id, j // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS nid, b.doc_id AS rid
      FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id >= 250 AND b.doc_id < 300),
    m AS (
      SELECT c.nid, c.rid, count(*) FILTER (WHERE sa.v = sb.v) AS matches
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.nid
      JOIN sig sb ON sb.doc_id = c.rid AND sb.j = sa.j
      GROUP BY 1, 2),
    dups AS (SELECT DISTINCT nid FROM m WHERE round(matches / 64.0, 6) >= 0.5)
    SELECT doc_id FROM documents
    WHERE doc_id >= 250 AND doc_id NOT IN (SELECT nid FROM dups)
    """,
)
def dedup_streaming_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted near-dup index END TO END: historical documents
    (doc_id < 300) replay through a REAL Structured Streaming source in
    two micro-batches into ``stream_lsh_index`` (signatures ride
    ``stream_to_runstore``'s transform hook — same HWM replay guard,
    locked manifest swap, LWW on re-crawled ids), then the incoming slice
    (doc_id >= 250) is deduped by ``lsh_dedup_from_store``: band keys
    re-derived map-side from the STORED signature arrays, full-signature
    verify, anti-join — historical content is never re-read or
    re-shingled.  Signature determinism (the bit-identical
    batch-vs-streaming pytest) is why a DuckDB replay of the batch
    pipeline is a valid oracle for the streamed store.  Compare
    ``dedup_incremental_lsh``, which recomputes the reference side from
    content each call — this query is what that one's docstring promises
    at warehouse scale.  Reference anchor: per-sstable summaries
    maintained at flush time, consulted before any data read
    (SSTableReader key-range/estimated-keys discipline)."""
    import tempfile

    from cassandra_util_spark.operators.dedup import lsh_dedup_from_store
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.dedup import stream_lsh_index

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    reference = d.filter(F.col("doc_id") < 300)
    incoming = _t(spark, sf_dir, "documents").filter(F.col("doc_id") >= 250)

    src = _pinned_shard_src(
        [
            reference.filter(F.col("doc_id").between(lo, hi))
            for lo, hi in ((0, 149), (150, 299))
        ],
        ["doc_id", "text"],
        "lsh-stream",
    )
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-lsh-index-"),
        TableMeta(("id",), (), "writetime"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    # NOT _scoped_shuffle_partitions-wrapped (r9): unlike the other
    # streaming drains, the LSH batch work is CPU-bound signature hashing
    # whose shuffle stages carry real rows — measured 5.1 s at 8 partitions
    # vs 4.9 s at the session's 32; the lever only pays when per-task
    # overhead dominates.
    q = stream_lsh_index(
        stream,
        store,
        tempfile.mkdtemp(prefix="lsh-stream-cp-"),
        id_col="doc_id",
        text_col="text",
    )
    q.awaitTermination(300)
    return lsh_dedup_from_store(
        incoming, store, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.5
    ).select("doc_id")


def _corpus_ingest_oracle(nb: int = 3, min_tokens: int = 30) -> str:
    """Chained-CTE DuckDB replay of stream_corpus_ingest's admission rules:
    batch k (doc_id % nb == k, processed in order) gates on raw token
    count, keeps the lowest id per identical text within the batch, drops
    texts already admitted, then drops LSH near-dups (est >= 0.5 on the
    shared 64-perm portable family) against the admitted-so-far set."""
    parts = [
        f"""gated AS (
      SELECT doc_id, text, doc_id % {nb} AS b FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= {min_tokens})"""
    ]
    for k in range(nb):
        parts.append(
            f"""surv{k} AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM gated WHERE b = {k}) WHERE rn = 1)"""
        )
        if k == 0:
            parts.append("adm0 AS (SELECT doc_id, text FROM surv0)")
            continue
        hist = " UNION ALL ".join(f"SELECT doc_id, text FROM adm{j}" for j in range(k))
        parts.append(f"hist{k} AS ({hist})")
        parts.append(
            f"""ex{k} AS (
      SELECT s.doc_id, s.text FROM surv{k} s
      WHERE s.text NOT IN (SELECT text FROM hist{k}))"""
        )
        parts.append(
            f"""cand{k} AS (
      SELECT DISTINCT a.doc_id AS nid, r.doc_id AS rid
      FROM bands a
      JOIN ex{k} e ON e.doc_id = a.doc_id
      JOIN bands r ON a.band = r.band AND a.bucket = r.bucket
      JOIN hist{k} m ON m.doc_id = r.doc_id)"""
        )
        parts.append(
            f"""m{k} AS (
      SELECT c.nid, c.rid, count(*) FILTER (WHERE sa.v = sb.v) AS matches
      FROM cand{k} c
      JOIN sig sa ON sa.doc_id = c.nid
      JOIN sig sb ON sb.doc_id = c.rid AND sb.j = sa.j
      GROUP BY 1, 2)"""
        )
        parts.append(
            f"dup{k} AS (SELECT DISTINCT nid FROM m{k} WHERE round(matches / 64.0, 6) >= 0.5)"
        )
        parts.append(
            f"""adm{k} AS (
      SELECT doc_id, text FROM ex{k} WHERE doc_id NOT IN (SELECT nid FROM dup{k}))"""
        )
    final = " UNION ALL ".join(f"SELECT doc_id FROM adm{j}" for j in range(nb))
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)),
    h AS (SELECT doc_id, {_p31('sh')} AS h FROM sh),
    sig AS (
      SELECT doc_id, p.j, min((p.a * h.h + p.b) % 2147483647) AS v
      FROM h CROSS JOIN {_minhash_params_sql(64)}
      GROUP BY doc_id, p.j),
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS bucket
      FROM sig GROUP BY doc_id, j // 4),
    {",".join(parts)}
    {final}
    """


@query("corpus_ingest_streaming", oracle=_corpus_ingest_oracle())
def corpus_ingest_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental crawl pipeline end to end: documents replay through
    a real file-source stream in three micro-batches (batch k = doc_id %
    3 == k) into ``stream_corpus_ingest`` — quality gate (raw token count
    ≥ 30), within-batch exact dedup (lowest id per text), digest
    anti-join against everything ever ADMITTED, banded MinHash probe
    against the maintained index (est ≥ 0.5 vs any admitted doc drops
    the newcomer) — and the admitted corpus store is the result.  The
    per-batch cost consults only the bounded index (digest + 64 bigints
    per admitted doc), never admitted content: the property that lets
    this pipeline absorb a 100 TB crawl shard-by-shard while
    ``training_corpus_assembly`` re-derives its corpus per run.  The
    oracle replays the admission chain batch-by-batch in chained CTEs —
    order-dependent semantics made deterministic by the modulo batch
    assignment.  Bench note: this line's cost is per-batch pipeline
    machinery, profiled at sf0.1 (SCALING.md r8): per batch ≈ 3.0 s
    gate/dedup/probe compute materialized at the survivor checkpoint
    (linear in shard size — real work), 2.1 s for the two locked store
    appends, 2.7 s trigger/source machinery; run-stats read-back is gone
    (parquet-footer walk, r8) — invisible at this sf but O(shard)→O(#files)
    at real shard sizes.  Constants amortize into noise at real
    crawl-shard sizes, by the same argument the runstore/twcs lifecycle
    queries make.
    Reference anchors: CQLBatch.scala's ordered sub-batch application;
    SSTableReader summary-before-data reads."""
    import tempfile

    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.corpus import stream_corpus_ingest

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    src = _pinned_shard_src(
        [d.filter(F.col("doc_id") % 3 == k) for k in range(3)],
        ["doc_id", "text"],
        "corpus-ingest",
    )
    corpus_store = RunStore(
        tempfile.mkdtemp(prefix="runstore-corpus-"),
        TableMeta(("doc_id",), (), "writetime"),
    )
    index_store = RunStore(
        tempfile.mkdtemp(prefix="runstore-corpus-index-"),
        TableMeta(("id",), (), "writetime"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    # State-partition sizing, the stream_interval_join_view lever (r9): the
    # admission chain's per-batch joins/windows inherit the session's
    # shuffle partitioning; at contract-query shard sizes 32 partitions are
    # pure per-task overhead across ~6 shuffles x 3 batches.  Scoped +
    # restored; admission semantics are partition-count-invariant (hash
    # unchanged), and a production deployment sizes this to shard
    # throughput the same way.
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_corpus_ingest(
            stream,
            corpus_store,
            index_store,
            tempfile.mkdtemp(prefix="corpus-ingest-cp-"),
            min_tokens=30,
        )
        q.awaitTermination(300)
    return corpus_store.read_merged(spark).select("doc_id")


# ---------------------------------------------------------------------------
# BPE vocabulary learning (tokenizer training)
# ---------------------------------------------------------------------------


def _bpe_w0_cte() -> str:
    """Initial word-frequency table with character segmentation."""
    return f"""w0 AS MATERIALIZED (
      SELECT word, cnt, list_concat(regexp_extract_all(word, '.'), ['{END_SYM}']) AS s
      FROM (SELECT x AS word, count(*) AS cnt FROM
            (SELECT unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                       x -> x <> '')) AS x FROM documents) t
            GROUP BY x) wf)"""


def _bpe_apply_ctes(i: int, prev: int) -> list:
    """CTE chain applying merge ``b{i}`` to word table ``w{prev}``,
    producing ``w{i}`` — the greedy left-to-right non-overlapping merge,
    positionally as match-islands keeping even offsets (equivalent to the
    Spark fold; equivalence pinned in tests/test_bpe.py).  ``g{i}`` pads
    an empty ``b{i}`` with a never-matching sentinel ('' is not a symbol)
    so a dry step degrades to a no-op — mirroring bpe_train's early break
    — instead of the empty CROSS JOIN annihilating ``w{i}`` and every
    later step."""
    return [
        f"""g{i} AS MATERIALIZED (
      SELECT lhs, rhs FROM b{i}
      UNION ALL
      SELECT '', '' WHERE NOT EXISTS (SELECT 1 FROM b{i}))""",
        f"""e{i} AS MATERIALIZED (
      SELECT w.word, w.cnt, t.j, w.s[t.j] AS sym,
             CASE WHEN t.j < len(w.s) AND w.s[t.j] = b.lhs AND w.s[t.j+1] = b.rhs
                  THEN 1 ELSE 0 END AS m
      FROM w{prev} w CROSS JOIN g{i} b, UNNEST(range(1, len(w.s) + 1)) t(j))""",
        f"""i{i} AS MATERIALIZED (
      SELECT word, cnt, j, sym, m,
             CASE WHEN m = 1 THEN j - row_number() OVER
               (PARTITION BY word, m ORDER BY j) END AS grp
      FROM e{i})""",
        f"""k{i} AS MATERIALIZED (
      SELECT word, j FROM (
        SELECT word, j, min(j) OVER (PARTITION BY word, grp) AS j0
        FROM i{i} WHERE m = 1) q
      WHERE (j - j0) % 2 = 0)""",
        f"""a{i} AS MATERIALIZED (
      SELECT e.word, e.cnt, e.j,
             CASE WHEN k.j IS NOT NULL THEN e.sym || b.rhs ELSE e.sym END AS sym,
             CASE WHEN k2.j IS NOT NULL THEN 1 ELSE 0 END AS dropped
      FROM e{i} e CROSS JOIN g{i} b
      LEFT JOIN k{i} k ON k.word = e.word AND k.j = e.j
      LEFT JOIN k{i} k2 ON k2.word = e.word AND k2.j = e.j - 1)""",
        f"""w{i} AS MATERIALIZED (
      SELECT word, any_value(cnt) AS cnt, list(sym ORDER BY j) AS s
      FROM a{i} WHERE dropped = 0 GROUP BY word)""",
    ]


def _bpe_sql(num_merges: int, final_select: str) -> str:
    """DuckDB replay of operators/bpe.py (batch=1): per merge step, count
    adjacent symbol pairs, take the (count desc, lhs, rhs) argmax, and
    re-segment every word via :func:`_bpe_apply_ctes`."""
    ctes = [_bpe_w0_cte()]
    for i in range(1, num_merges + 1):
        p = i - 1
        ctes.append(f"""p{i} AS MATERIALIZED (
      SELECT s[j] AS lhs, s[j+1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c
      FROM w{p}, UNNEST(range(1, len(s))) t(j) GROUP BY 1, 2)""")
        ctes.append(f"""b{i} AS MATERIALIZED (
      SELECT lhs, rhs, c FROM p{i} ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1)""")
        ctes += _bpe_apply_ctes(i, p)
    return "WITH " + ",\n    ".join(ctes) + "\n    " + final_select


def _bpe_batched_sql(num_merges: int, batch: int, final_select: str) -> str:
    """DuckDB replay of operators/bpe.py with ``batch`` > 1 — the
    production fast-trainer path.  Per ROUND: one pair count over the
    word table, one top-(4·batch) candidate pool in (count desc, lhs,
    rhs) order, then the greedy SYMBOL-DISJOINT prefix (_select_disjoint:
    slot j takes the pool's best row colliding with none of the round's
    earlier slots on lhs/rhs/merged), applied SEQUENTIALLY — which equals
    Spark's one composed fold exactly because the pairs are disjoint
    (pinned in tests/test_bpe.py).  A thin round (pool exhausted by
    collisions) pads with the no-op sentinel, so Spark's
    keep-looping-until-num_merges semantics would then SHOW UP as a
    row-count mismatch rather than silently diverging — the fixture has
    no thin rounds (probed: 2 rounds × 4 taken at sf0.01)."""
    ctes = [_bpe_w0_cte()]
    n_rounds = (num_merges + batch - 1) // batch
    for r in range(1, n_rounds + 1):
        base = (r - 1) * batch
        want = min(batch, num_merges - base)
        pool = want if want == 1 else 4 * want
        ctes.append(f"""p_r{r} AS MATERIALIZED (
      SELECT s[j] AS lhs, s[j+1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c
      FROM w{base}, UNNEST(range(1, len(s))) t(j) GROUP BY 1, 2)""")
        ctes.append(f"""t_r{r} AS MATERIALIZED (
      SELECT lhs, rhs, c FROM p_r{r}
      ORDER BY c DESC, lhs ASC, rhs ASC LIMIT {pool})""")
        for j in range(1, want + 1):
            i = base + j
            excl = "".join(
                f"""
        AND NOT EXISTS (SELECT 1 FROM b{base + q} pb
          WHERE t.lhs IN (pb.lhs, pb.rhs, pb.lhs || pb.rhs)
             OR t.rhs IN (pb.lhs, pb.rhs, pb.lhs || pb.rhs)
             OR (t.lhs || t.rhs) IN (pb.lhs, pb.rhs, pb.lhs || pb.rhs))"""
                for q in range(1, j)
            )
            ctes.append(f"""b{i} AS MATERIALIZED (
      SELECT lhs, rhs, c FROM t_r{r} t
      WHERE 1 = 1{excl}
      ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1)""")
            ctes += _bpe_apply_ctes(i, i - 1)
    return "WITH " + ",\n    ".join(ctes) + "\n    " + final_select


END_SYM = "</w>"
_BPE_N = 10

_BPE_MERGES_SELECT = "\nUNION ALL\n".join(
    f"SELECT {i - 1} AS step, lhs, rhs, lhs || rhs AS merged, c AS cnt FROM b{i}"
    for i in range(1, _BPE_N + 1)
)


@query("bpe_learned_merges", oracle=_bpe_sql(_BPE_N, _BPE_MERGES_SELECT))
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary learning (Sennrich et al. 2016), 10 merge steps over
    the document corpus: each step is one pair-count shuffle over the
    VOCABULARY-sized word-frequency table plus a 1-row argmax collect and
    a map-only greedy fold re-segmentation — the standard trick that makes
    BPE training tractable at web scale (the corpus is scanned once; the
    merge loop never rereads it).  The oracle replays every step in SQL,
    so the learned merge sequence — including count-tie resolution and the
    adjacent-repeat greedy semantics the naive string-replace gets wrong —
    is hash-certified end to end."""
    from cassandra_util_spark.operators.bpe import bpe_merge_table, bpe_train

    d = _t(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, "text", num_merges=_BPE_N)
    return bpe_merge_table(spark, merges)


@query(
    "bpe_token_profile",
    oracle=_bpe_sql(
        _BPE_N,
        f"""
    , dw AS (SELECT doc_id,
               unnest(list_filter(string_split({_NORM_SQL}, ' '), x -> x <> ''))
                 AS word
             FROM documents)
    SELECT d.doc_id, count(*) AS n_words,
           CAST(sum(len(w.s)) AS BIGINT) AS n_bpe_tokens
    FROM dw d JOIN w{_BPE_N} w USING (word)
    GROUP BY d.doc_id
    """,
    ),
)
def bpe_token_profile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenized under the learned BPE vocabulary: per document the
    word count and the exact BPE token count, computed by JOINING words to
    their final segmentations (BPE is word-local, so the trained word
    table is the tokenizer — no per-document re-segmentation ever runs).
    This is the real token-budget input for a training pipeline: the
    text.bpe_token_estimate regex is the cheap static guess, this is the
    learned-vocab truth."""
    from cassandra_util_spark.operators.bpe import bpe_token_profile, bpe_train

    d = _t(spark, sf_dir, "documents")
    _, words = bpe_train(d, "text", num_merges=_BPE_N)
    return bpe_token_profile(d, "doc_id", "text", words)


@query(
    "stream_interval_join_view",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
               FROM events),
    c AS (SELECT user_id, event_id AS click_id, us AS click_us
          FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, us AS purchase_us
          FROM e WHERE event_type = 'purchase')
    SELECT c.user_id, click_id, purchase_id, click_us, purchase_us
    FROM c JOIN p USING (user_id)
    WHERE purchase_us >= click_us
      AND purchase_us <= click_us + 14400000000
    """,
)
def stream_interval_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM interval join, hash-certified end to end:
    events replay through a real file source (quarter-span micro-batches,
    the twcs_streaming_view cadence), split into a click stream and a
    purchase stream, and joined same-user within the following 4 hours —
    the attribution-window shape.  The event-time bound in the join
    condition plus both-side watermarks is what makes stream-stream join
    state BOUNDED (Spark can prove when a buffered click can never match
    again and evict it); here the watermark delay is set beyond the replay
    span so zero rows are at risk from replay ordering and the drained
    result is row-identical to the batch range join the oracle runs —
    eviction-under-tight-watermark behavior is pinned separately in
    test_streaming.py.  Reference anchor: the reference's retrospective
    deletion pairs late-arriving data against standing state
    (DeletingCompactionStrategy.java:45-58 motivation); this is the
    two-stream generalization.

    Profiled r9 (SCALING.md): the 18 s bench line was 9 s of EMPTY final
    batch — 4 join state stores x 64 shuffle partitions committing for a
    0-row watermark-advance trigger — plus 4 full event scans writing the
    replay files.  Three changes, hash-unchanged: the replay files are
    written in ONE pass (partitionBy the window id, then flatten — the
    files are identical); the stream runs with state partitions sized to
    the data (state partitioning is a per-checkpoint runtime knob, NOT an
    operator property — a 1000-executor deployment sets it to match
    throughput exactly the same way); and the no-data trigger is skipped
    for this drain (an INNER interval join under a beyond-replay watermark
    emits every row in its processing batch; the final empty batch only
    advances the watermark for eviction, which this query's contract does
    not observe — eviction is pinned in test_streaming.py under a tight
    watermark where the no-data batch stays enabled)."""
    import glob
    import os
    import tempfile

    from cassandra_util_spark.streaming.events import (
        stream_events,
        streaming_interval_join,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    row = ev.select(writetime_micros(F.col("ts")).alias("wt")).agg(
        F.min("wt").alias("mn"), F.max("wt").alias("mx")
    ).collect()[0]
    mn_us, win = row["mn"], (row["mx"] - row["mn"]) // 4 + 1
    # one scan, four replay files: write partitioned by quarter-span window,
    # then flatten the partition dirs (the parquet files inside carry the
    # full row schema; the dir key was only a write-path router)
    staging = tempfile.mkdtemp(prefix="sij-staging-")
    src = tempfile.mkdtemp(prefix="sij-src-")
    (
        ev.withColumn("wt", writetime_micros(F.col("ts")))
        .withColumn("w", F.expr(f"(wt - {mn_us}) div {win}"))
        .drop("wt")
        .repartition("w")
        .write.partitionBy("w")
        .parquet(staging, mode="overwrite")
    )
    for i, f in enumerate(sorted(glob.glob(os.path.join(staging, "w=*", "*.parquet")))):
        os.rename(f, os.path.join(src, f"replay-{i:03d}.parquet"))
    schema = ev.schema
    clicks = stream_events(spark, src, schema).filter(F.col("event_type") == "click")
    purch = stream_events(spark, src, schema).filter(F.col("event_type") == "purchase")
    joined = streaming_interval_join(
        clicks.select("user_id", "event_id", "ts"),
        purch.select("user_id", "event_id", "ts"),
        "user_id",
        max_delay="4 hours",
        watermark="3650 days",
    ).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        writetime_micros(F.col("ts")).alias("click_us"),
        writetime_micros(F.col("ts_r")).alias("purchase_us"),
    )
    out = tempfile.mkdtemp(prefix="sij-out-")
    cp = tempfile.mkdtemp(prefix="sij-cp-")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        q = (
            joined.writeStream.outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata)
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# Product quantization ANN (ADC + re-rank)
# ---------------------------------------------------------------------------

# Shared oracle pieces: the PQ seed codebooks are the ivf_seeds hash-order
# sample sliced into 8 contiguous 8-dim subspaces; squared-L2 folds run
# left-to-right (list_reduce == Spark's F.aggregate order) and round to 4dp
# before any compare, the similarity.py engine-exactness discipline.
def _pq_l2sq_sql(a_elem: str, b_elem: str, n: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {n + 1}), "
        f"i -> ({a_elem} - {b_elem}) * ({a_elem} - {b_elem})), (x, y) -> x + y)"
    )


def _pq_base_sql(num_codes: int) -> str:
    sub_d = _pq_l2sq_sql("c.v[t.j*8 + i]", "s.v[t.j*8 + i]", 8)
    q_d = _pq_l2sq_sql("q.v[t.j*8 + i]", "s.v[t.j*8 + i]", 8)
    return f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS code, v FROM corpus
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT {num_codes}),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT c.vec_id, t.j AS sub, s.code,
               row_number() OVER (PARTITION BY c.vec_id, t.j
                 ORDER BY round({sub_d}, 4) ASC, s.code ASC) AS rn
        FROM corpus c CROSS JOIN range(8) t(j) CROSS JOIN seeds s) WHERE rn = 1),
    dtab AS (
      SELECT q.vec_id AS query_id, t.j AS sub, s.code,
             CAST(round(round({q_d}, 4) * 10000.0::DOUBLE) AS BIGINT) AS d9
      FROM corpus q CROSS JOIN range(8) t(j) CROSS JOIN seeds s
      WHERE q.vec_id < 5),
    adc AS (
      SELECT d.query_id, e.vec_id AS neighbor_id, CAST(sum(d.d9) AS BIGINT) AS adc9
      FROM enc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
      WHERE e.vec_id <> d.query_id
      GROUP BY d.query_id, e.vec_id)
    """


@query(
    "ann_pq_adc_topk",
    oracle=_pq_base_sql(16)
    + """
    SELECT query_id, neighbor_id, adc9, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id, adc9,
             row_number() OVER (PARTITION BY query_id
               ORDER BY adc9 ASC, neighbor_id ASC) AS rank
      FROM adc) WHERE rank <= 10
    """,
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, pure asymmetric-distance scan (Jégou et
    al., TPAMI 2011): the corpus collapses to 8 one-byte-ish codes per
    vector (argmin per 8-dim subspace against a 16-entry seed codebook),
    queries score every row by an m-term integer table-lookup sum.  The
    100 TB point is the MEMORY shape: the scan touches 64 compressed
    bytes per vector instead of a 512-byte float64 vector — the codebook
    is a plan literal (bounded m·K rows, the IVF centroid-collect
    discipline), scoring is map-only whole-stage codegen with zero joins
    before the per-query top-k window.  Integer-scaled distances
    (round(d4·1e4) bigint) make the m-term sums and the ranking
    hash-exact across engines.  Measured recall@10 vs exact L2 at
    sf0.001: 0.28 — this is the raw compressed scan; recall is bought
    back by re-ranking (ann_pq_rerank_topk)."""
    from cassandra_util_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    cb = pq_codebooks(e)
    codes = pq_encode(e, cb)
    return pq_topk(codes, cb, e.filter(F.col("vec_id") < 5), k=10)


@query(
    "ann_pq_rerank_topk",
    oracle=_pq_base_sql(32)
    + ", short AS ("
    + """
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY adc9 ASC, neighbor_id ASC) AS rank
        FROM adc) WHERE rank <= 128),
    ex AS (
      SELECT s.query_id, s.neighbor_id,
             round("""
    + _pq_l2sq_sql("q.v[i]", "c.v[i]", 64)
    + """, 4) AS d4
      FROM short s JOIN corpus q ON q.vec_id = s.query_id
                   JOIN corpus c ON c.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, d4, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id, d4,
             row_number() OVER (PARTITION BY query_id
               ORDER BY d4 ASC, neighbor_id ASC) AS rank
      FROM ex) WHERE rank <= 10
    """,
)
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC shortlist + exact re-rank (IVFADC+R): the compressed scan
    proposes 128 candidates per query, and only those rows' original
    vectors are read back and exactly scored — measured recall@10 vs
    exact L2 at sf0.001: 0.94 (vs 0.28 for the raw scan) with K=32
    codebooks.  At 100 TB the expensive pass stays code-only; the exact
    pass touches rerank×|queries| rows through a broadcast-size id join —
    the recall/IO trade is the rerank width, a config constant, not a
    corpus-sized rescan."""
    from cassandra_util_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk_rerank,
    )

    e = _t(spark, sf_dir, "embeddings")
    cb = pq_codebooks(e, num_codes=32)
    codes = pq_encode(e, cb, num_codes=32)
    return pq_topk_rerank(
        codes, cb, e, e.filter(F.col("vec_id") < 5),
        k=10, rerank=128, num_codes=32,
    )


def _ivfpq_oracle_sql(cand_join: str = "", cand_where: str = "TRUE") -> str:
    """The full IVFADC replay (seed centroids -> residual codebooks ->
    per-cell ADC -> exact rerank) as DuckDB SQL.  ``cand_join`` /
    ``cand_where`` inject a FILTERED-search candidate predicate into the
    ADC CTE — the filter lands before scoring, exactly where the Spark
    operator's candidates semi-join lands, so filtered and unfiltered
    oracles share every other stage."""
    return (
        """
        WITH corpus AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        cents AS (
          SELECT vec_id AS cell, v AS cv FROM corpus
          ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 16),
        assigned AS (
          SELECT vec_id, cell FROM (
            SELECT c.vec_id, s.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round(CASE WHEN isnan(list_cosine_similarity(c.v, s.cv))
                                         THEN 0 ELSE list_cosine_similarity(c.v, s.cv)
                                    END, 4) DESC, s.cell ASC) AS rn
            FROM corpus c CROSS JOIN cents s) WHERE rn = 1),
        res AS (
          SELECT a.vec_id, a.cell,
                 list_transform(range(1, 65), i -> c.v[i] - s.cv[i]) AS rv
          FROM assigned a JOIN corpus c ON c.vec_id = a.vec_id
                          JOIN cents s ON s.cell = a.cell),
        cb AS (
          SELECT vec_id AS code, rv FROM res
          ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 16),
        enc AS (
          SELECT vec_id, cell, sub, code FROM (
            SELECT r.vec_id, r.cell, t.j AS sub, s.code,
                   row_number() OVER (PARTITION BY r.vec_id, t.j
                     ORDER BY round("""
        + _pq_l2sq_sql("r.rv[t.j*8 + i]", "s.rv[t.j*8 + i]", 8)
        + """, 4) ASC, s.code ASC) AS rn
            FROM res r CROSS JOIN range(8) t(j) CROSS JOIN cb s) WHERE rn = 1),
        queries AS (SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 5),
        probes AS (
          SELECT query_id, cell, list_transform(range(1, 65), i -> qv[i] - cv[i]) AS qr
          FROM (
            SELECT q.query_id, q.qv, s.cell, s.cv,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.qv, s.cv) DESC, s.cell ASC) AS rn
            FROM queries q CROSS JOIN cents s) WHERE rn <= 4),
        dtab AS (
          SELECT p.query_id, p.cell, t.j AS sub, s.code,
                 CAST(round(round("""
        + _pq_l2sq_sql("p.qr[t.j*8 + i]", "s.rv[t.j*8 + i]", 8)
        + """, 4) * 10000.0::DOUBLE) AS BIGINT) AS d9
          FROM probes p CROSS JOIN range(8) t(j) CROSS JOIN cb s),
        adc AS (
          SELECT d.query_id, e.vec_id AS neighbor_id, CAST(sum(d.d9) AS BIGINT) AS adc9
          FROM enc e JOIN dtab d ON d.cell = e.cell AND d.sub = e.sub AND d.code = e.code
          """ + cand_join + """
          WHERE e.vec_id <> d.query_id AND (""" + cand_where + """)
          GROUP BY d.query_id, e.vec_id),
        short AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY adc9 ASC, neighbor_id ASC) AS rank
            FROM adc) WHERE rank <= 64),
        ex AS (
          SELECT s.query_id, s.neighbor_id,
                 round("""
        + _pq_l2sq_sql("q.v[i]", "c.v[i]", 64)
        + """, 4) AS d4
          FROM short s JOIN corpus q ON q.vec_id = s.query_id
                       JOIN corpus c ON c.vec_id = s.neighbor_id)
        SELECT query_id, neighbor_id, d4, CAST(rank AS BIGINT) AS rank FROM (
          SELECT query_id, neighbor_id, d4,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY d4 ASC, neighbor_id ASC) AS rank
          FROM ex) WHERE rank <= 10
        """
    )


@query(
    "ann_ivfpq_topk",
    oracle=_ivfpq_oracle_sql(),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC end to end (Jégou et al., TPAMI 2011 §IV) — the composed
    100 TB ANN architecture: coarse IVF assignment to K=16 seed centroids
    prunes the scan to nprobe=4 probed cells; inside those cells an
    asymmetric-distance scan runs over PQ codes of the RESIDUALS
    (x − centroid, per-cell re-expressed query); the 64-wide shortlist is
    exactly re-ranked from original vectors.  Every stage replays in SQL:
    seed centroids/codebooks (hash-order sample), 4dp-rounded argmax/argmin
    frontiers, integer-scaled ADC sums — the whole three-stage pipeline is
    value-hash certified, including the residual arithmetic.  At 100 TB
    the scan reads N·nprobe/K rows of 8-byte-per-subspace codes (cell-
    partitioned codes make the probe join file-skipping), and the only
    vector reads are rerank×|queries| re-rank rows.  Measured recall@10 vs
    exact L2 at sf0.001: see tests/test_ivfpq.py (Lloyd-refined recall
    ladder)."""
    from cassandra_util_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") < 5),
        k=10, coarse_k=16, nprobe=4, m=8, num_codes=16, rerank=64,
    )


@query("ivfpq_persisted_probe", oracle=None)
def ivfpq_persisted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVFADC index end to end: write the layout to a temp
    dir — centroids (16 rows), residual codebooks (m·num_codes rows), and
    a codes/ table partitioned by cell holding ONLY (id, 8 bigint codes),
    no vectors — then probe it with the same parameters as ann_ivfpq_topk
    and hash-match the SAME oracle.  Proves the on-disk partition-pruned
    path (cell IN (...) reaching PartitionFilters at file-listing time,
    pinned in tests/test_runstore.py's pruning asserts for the IVF layout
    and test_ivfpq.py for this one) returns byte-identical neighbors to
    the in-memory IVFADC plan, and that the index directory carries the
    64-of-512-bytes-per-vector memory contract physically."""
    import tempfile

    from cassandra_util_spark.sources.ivf_index import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivfpq-") + "/idx"
    write_ivfpq_index(e, path, coarse_k=16, m=8, num_codes=16, refine_iters=0)
    return probe_ivfpq_index(
        spark, path, e.filter(F.col("vec_id") < 5), corpus=e,
        k=10, nprobe=4, m=8, num_codes=16, rerank=64,
    )


ORACLES["ivfpq_persisted_probe"] = ORACLES["ann_ivfpq_topk"]


@query("ivfpq_streaming_index", oracle=None)
def ivfpq_streaming_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN index maintenance end to end: the IVFADC model
    (seed centroids + residual codebooks, the exact ann_ivfpq_topk
    derivation) is frozen up front, the embedding corpus replays through
    a real file-source stream in three micro-batches (vec_id % 3), each
    batch PQ-encodes map-only against the frozen model and appends its
    8·m-byte code rows to a run store under the locked idempotent-ingest
    protocol, and the final probe reads the LWW-merged store — returning
    byte-identical neighbors to the static index and the in-memory plan,
    hash-matched against the SAME oracle.  Encoding is row-local under a
    frozen model, so the streamed store converges to the batch index
    regardless of batch boundaries — the property that lets a 100 TB
    embedding store grow shard-by-shard without ever re-encoding
    history."""
    import tempfile

    from cassandra_util_spark.operators.similarity import (
        ivf_assign,
        ivf_seeds,
        pq_codebooks,
    )
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.ann import (
        probe_ivfpq_store,
        stream_ivfpq_index,
    )

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = ivf_seeds(e, "vec_id", "embedding", 16)
    cent_sel = cents.select(
        F.col("vec_id").alias("cell"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("cent_vec"),
    )
    res = (
        ivf_assign(e, cents)
        .join(F.broadcast(cent_sel), "cell")
        .select(
            "vec_id",
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.col("cent_vec"),
                lambda a, b: a - b,
            ).alias("__res"),
        )
    )
    cb = pq_codebooks(res, "vec_id", "__res", 64, 8, 16).localCheckpoint()

    src = _pinned_shard_src(
        [e.filter(F.col("vec_id") % 3 == k) for k in range(3)],
        list(e.columns),
        "ivfpq-stream",
    )
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-ivfpq-"),
        TableMeta(("vec_id",), (), "writetime"),
    )
    stream = spark.readStream.schema(e.schema).option("maxFilesPerTrigger", 1).option(
        "latestFirst", "false"
    ).parquet(os.path.join(src, "shard-*"))
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_ivfpq_index(
            stream, store, tempfile.mkdtemp(prefix="ivfpq-stream-cp-"), cents, cb
        )
        q.awaitTermination(300)
    return probe_ivfpq_store(
        spark, store, cents, cb, e.filter(F.col("vec_id") < 5), corpus=e,
        k=10, nprobe=4, m=8, num_codes=16, rerank=64,
    )


ORACLES["ivfpq_streaming_index"] = ORACLES["ann_ivfpq_topk"]


# ---------------------------------------------------------------------------
# Training-data pipeline: trained quality classifier (CCNet / GPT-3 stage)
# ---------------------------------------------------------------------------

# Seed label for the classifier contract queries: "jargon-dense" documents —
# >= 1/7 of tokens drawn from a 4-term domain vocabulary.  The label is a
# deterministic text property (this corpus's lang/source columns are random
# w.r.t. the text, so nothing latent is learnable); the classifier must
# rediscover it THROUGH 512 hashed unigram buckets, which is the same
# token-presence signal CCNet's wiki-vs-crawl filter learns.  Measured at
# sf0.001: recall 1.0, precision ~0.65 on held-out — real skill, not a
# replay of the labeling rule.
_JARGON = ("vector", "stream", "merge", "hash")
_JARGON_SQL = "('vector', 'stream', 'merge', 'hash')"

# Shared oracle CTE chain: tokenize, label, hash-bucket counts, fit on even
# doc_ids, score odd doc_ids — the exact integer-scaled arithmetic of
# operators/classifier.py (see its module docstring for the estimator).
_CLS_BASE_SQL = f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS w
             FROM norm),
    lab AS (SELECT doc_id,
                   len(list_filter(w, x -> x IN {_JARGON_SQL})) * 7 >= len(w) AS hq
            FROM toks),
    bk AS (SELECT doc_id, CAST({_p31('x')} % 512 AS INT) AS k
           FROM (SELECT doc_id, unnest(w) AS x FROM toks)),
    cnt AS (SELECT doc_id, k, count(*) AS c FROM bk GROUP BY doc_id, k),
    seed AS (SELECT c.doc_id, c.k, c.c, l.hq
             FROM cnt c JOIN lab l USING (doc_id) WHERE c.doc_id % 2 = 0),
    cls AS (SELECT k,
              CAST(sum(CASE WHEN hq THEN c ELSE 0 END) AS BIGINT) AS p,
              CAST(sum(CASE WHEN NOT hq THEN c ELSE 0 END) AS BIGINT) AS ng
            FROM seed GROUP BY k),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(sum(ng) AS BIGINT) AS tn
            FROM cls),
    model AS (SELECT k,
               CAST(round((CAST((2*p + 1) * (2*tot.tn + 512) AS DOUBLE)
                     / CAST((2*ng + 1) * (2*tot.tp + 512) AS DOUBLE))
                     * 1000000000.0::DOUBLE) AS BIGINT) AS lam9
              FROM cls CROSS JOIN tot),
    sc AS (SELECT c.doc_id,
            CAST(sum(c.c) AS BIGINT) AS n_toks,
            CAST(sum(CAST(c.c AS HUGEINT) * COALESCE(m.lam9, 1000000000))
                 AS HUGEINT) AS num9
           FROM cnt c LEFT JOIN model m ON m.k = c.k
           WHERE c.doc_id % 2 = 1
           GROUP BY c.doc_id),
    scored AS (SELECT doc_id, n_toks,
                round(CAST(num9 AS DOUBLE) / n_toks / 1000000000.0::DOUBLE, 6)
                  AS score,
                num9 >= n_toks * 1000000000 AS predicted
               FROM sc)
"""


def _cls_seed_and_held(spark: SparkSession, sf_dir: str):
    from cassandra_util_spark.operators.classifier import fit_token_classifier
    from cassandra_util_spark.operators.text import _norm_tokens

    d = _t(spark, sf_dir, "documents")

    def labeled(df):
        w = _norm_tokens(F.col("text"))
        return df.withColumn(
            "hq", F.size(F.filter(w, lambda t: t.isin(*_JARGON))) * 7 >= F.size(w)
        )

    seed = labeled(d.filter(F.col("doc_id") % 2 == 0))
    model = fit_token_classifier(seed, "doc_id", "text", "hq")
    held = d.filter(F.col("doc_id") % 2 == 1)
    return model, held, labeled


@query(
    "quality_classifier_scores",
    oracle=_CLS_BASE_SQL + "SELECT doc_id, n_toks, score, predicted FROM scored",
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality filter, the CCNet/GPT-3 pipeline stage: fit a
    hashed-bucket Naive-Bayes likelihood-ratio model on the labeled seed
    (even doc_ids, jargon-density label), score the held-out half map-side
    against the broadcast 512-row model.  The estimator is log-free DSIR
    arithmetic (operators/classifier.py docstring): per-bucket integer
    rationals scaled to round(λ·1e9), exact bigint tf-weighted sums, so
    scores AND the predicted boundary (score >= 1) hash-match the oracle
    bit for bit.  100 TB: the model is bounded by config (512 rows) — the
    corpus-side cost is one (id, bucket) shuffle with map-side partial
    aggregation and a broadcast join, independent of vocabulary size.
    Reference anchor: the trained analogue of the convictor keep/drop gate
    (AbstractClusterDeletingConvictor.java:31-47)."""
    from cassandra_util_spark.operators.classifier import score_with_classifier

    model, held, _ = _cls_seed_and_held(spark, sf_dir)
    return score_with_classifier(held, model, "doc_id", "text")


@query(
    "quality_classifier_eval",
    oracle=_CLS_BASE_SQL
    + """
    SELECT s.predicted, l.hq AS actual, count(*) AS n_docs
    FROM scored s JOIN lab l USING (doc_id)
    GROUP BY s.predicted, l.hq
    """,
)
def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out confusion matrix of the trained quality filter:
    (predicted, actual, n_docs), at most 4 rows.  The held-out half never
    enters the fit, so this is a true generalization measurement — the
    hash oracle certifies the full train/score/compare chain, not just the
    counts.  At 100 TB the eval joins scored ids to labels on the id key
    and aggregates to 4 rows — no wide state."""
    from cassandra_util_spark.operators.classifier import (
        classifier_confusion,
        score_with_classifier,
    )

    model, held, labeled = _cls_seed_and_held(spark, sf_dir)
    scored = score_with_classifier(held, model, "doc_id", "text")
    return classifier_confusion(scored, labeled(held), "doc_id", "hq")


@query(
    "pareto_document_selection",
    oracle=_CLS_BASE_SQL
    + f"""
    , par AS (SELECT doc_id, n_toks, score,
        CAST(1000000 - ({_p31("CAST(doc_id AS VARCHAR)")} % 1000000) AS HUGEINT) AS v,
        CAST(GREATEST(CAST(round((2.0::DOUBLE - score) * 1000.0::DOUBLE) AS BIGINT),
                      0) AS HUGEINT) AS a
       FROM scored)
    SELECT doc_id, n_toks, score FROM par
    WHERE v * a*a*a*a*a*a*a*a*a
          < CAST('1000000000000000000000000000000000' AS HUGEINT)
    """,
)
def pareto_document_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3's stochastic quality selection (Brown et al. 2020, App. A:
    keep iff pareto(9) > 1 - score) replayed DETERMINISTICALLY: the Pareto
    draw is inverted into an all-integer inequality on (id-hash uniform,
    3dp score) — no pow/log/RNG, so the accepted set is identical across
    engines, retries, and speculative re-execution while the acceptance
    probability matches np.random.pareto(9) at 3dp of the score
    (operators/classifier.py:pareto_keep_expr derivation).  Map-only on
    top of the scored stream — the selection adds zero shuffles at any
    scale."""
    from cassandra_util_spark.operators.classifier import (
        pareto_select,
        score_with_classifier,
    )

    model, held, _ = _cls_seed_and_held(spark, sf_dir)
    scored = score_with_classifier(held, model, "doc_id", "text")
    return pareto_select(scored, "doc_id").select("doc_id", "n_toks", "score")


# ---------------------------------------------------------------------------
# Round-7 window rotation (VERDICT r6 task 1): ten rows driver-certified in
# r4+r5+r6 move just past the window in favor of the ten highest-value
# never-driver-checked queries, exactly the VERDICT's candidate list.
# Family coverage in the window is preserved: TPC-H keeps q4/q6/q9/q10/
# parts_above_avg_price/orders_pivot/acctbal and gains q7; events keeps
# funnel/incremental_rollup and gains cohort_retention; text swaps
# text_quality for the gopher gate + full corpus pipeline; dedup stays
# 5-deep (minhash, winnowing, incremental, incremental_lsh, clusters_star);
# embeddings keep dedup_resolve/ann_ivf/semantic; range_join_incidents
# keeps the temporal-join family after asof moves out.  The pinned prefix
# snapshot in tests/test_plan_hygiene.py is updated in the same commit, as
# that test's docstring sanctions.
_WINDOW_ROTATE_OUT_R7 = [
    "q1_pricing_summary",         # certified r4+r5+r6 (VERDICT-named)
    "q3_shipping_priority",       # certified r4+r5+r6 (VERDICT-named)
    "q5_region_revenue",          # certified r4+r5+r6 (VERDICT-named)
    "top_orders_per_customer",    # certified r4+r5+r6 (VERDICT-named)
    "events_hourly_rollup",       # certified r4+r5+r6 (VERDICT-named)
    "text_quality",               # certified r4+r5+r6 (VERDICT-named)
    "dedup_ngram_jaccard",        # certified r4+r5+r6 (VERDICT-named)
    "embedding_neardup",          # certified r4+r5+r6 (VERDICT-named)
    "events_sessionize",          # certified r4+r5+r6 (VERDICT-named)
    "asof_join_clicks_purchases", # certified r4+r5+r6 (VERDICT-named)
]
_WINDOW_ROTATE_IN_R7 = [
    "advised_join_exec",
    "counter_store_totals",
    "zorder_layout_key",
    "runstore_skipindex_view",
    "twcs_retention_view",
    "bucketed_colocated_join",
    "q7_volume_shipping",
    "corpus_clean_pipeline",
    "gopher_quality_gate",
    "events_cohort_retention",
]


def _rotate_driver_window_r7() -> None:
    names = list(QUERIES)
    missing = [
        n for n in _WINDOW_ROTATE_IN_R7 + _WINDOW_ROTATE_OUT_R7 if n not in QUERIES
    ]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_ROTATE_OUT_R7)]
    prefix += _WINDOW_ROTATE_IN_R7
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r7()


# ---------------------------------------------------------------------------
# Round-8 window rotation (VERDICT r7 task 2): ten rows in the window since
# round 5 and driver-certified three times (r5+r6+r7, 50/50 green each) move
# just past the window in favor of the ten never-driver-checked round-7
# additions — exactly the VERDICT's candidate list.  Family coverage in the
# window is preserved: TPC-H keeps q4/q7/q9/acctbal after q6/q10/
# parts_above_avg_price/orders_pivot move out; counters keep
# counter_store_totals after counter_merge; merge/LSM keeps the runstore/
# TWCS views after lww_merge; dedup keeps clusters_star/incremental_lsh/
# winnowing/incremental and GAINS the lossless prefix-Jaccard and the
# streaming LSH index; embeddings keep dedup_resolve/ann_ivf and trade
# semantic_dedup for its certified scale-safe K-proportional variant plus
# PQ ANN; events keep funnel/cohort/incremental_rollup after
# salted_event_rollup; media keeps media_dedup after media_features.  The
# pinned prefix snapshot in tests/test_plan_hygiene.py is updated in the
# same commit, as that test's docstring sanctions.
_WINDOW_ROTATE_OUT_R8 = [
    "counter_merge",            # certified r5+r6+r7
    "lww_merge",                # certified r5+r6+r7
    "dedup_minhash_lsh",        # certified r5+r6+r7
    "semantic_dedup",           # certified r5+r6+r7 (scaled variant enters)
    "q10_returned_items",       # certified r5+r6+r7
    "q6_forecast_revenue",      # certified r5+r6+r7
    "parts_above_avg_price",    # certified r5+r6+r7
    "orders_pivot_priority",    # certified r5+r6+r7
    "media_features",           # certified r5+r6+r7
    "salted_event_rollup",      # certified r5+r6+r7
]
_WINDOW_ROTATE_IN_R8 = [
    "semantic_dedup_scaled",
    "twcs_streaming_view",
    "dedup_streaming_lsh",
    "corpus_ingest_streaming",
    "dedup_ngram_prefix",
    "ann_pq_adc_topk",
    "bpe_learned_merges",
    "quality_classifier_scores",
    "pareto_document_selection",
    "stream_interval_join_view",
]


def _rotate_driver_window_r8() -> None:
    names = list(QUERIES)
    missing = [
        n for n in _WINDOW_ROTATE_IN_R8 + _WINDOW_ROTATE_OUT_R8 if n not in QUERIES
    ]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_ROTATE_OUT_R8)]
    prefix += _WINDOW_ROTATE_IN_R8
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r8()


# ---------------------------------------------------------------------------
# Round-9 window rotation (VERDICT r8 task 2): rotate HARDER — 24 fresh rows,
# not 10.  Every swapped-out row is driver-certified at least three times
# (the retention/ANN/TPC-H core 7-8 times, the r5 family representatives 4
# times, cdc/tombstone/bucketed/q9 three times); every swapped-in row has
# NEVER been driver-checked: the 8 rows the r8 judge certified locally
# (IVFADC trio, Jaccard router pair, bpe_token_profile, ann_pq_rerank_topk,
# quality_classifier_eval), the entire TPC-H tail (q8, q11-q22 — thirteen
# rows with zero driver coverage), the PII pair, and retention_rule_impact.
# Family coverage in the window is preserved: retention keeps
# retention_rule_impact (plus the driver's own entry() smoke on
# retention_rules_delete) after the four-row retention core moves out; ANN
# trades ann_ivf_topk for the three IVFADC paths + PQ rerank; dedup keeps
# incremental/ngram_prefix/streaming_lsh/semantic_scaled and GAINS the
# routed-Jaccard pair after clusters_star/incremental_lsh/winnowing move
# out; retrieval keeps hybrid_retrieval_rrf after bm25_search moves out;
# TPC-H trades q4/q9/acctbal for the thirteen-row tail; streaming keeps all
# five streaming rows.  The pinned prefix snapshot in
# tests/test_plan_hygiene.py is updated in the same commit, as that test's
# docstring sanctions.
_WINDOW_ROTATE_OUT_R9 = [
    "retention_rules_delete",    # certified 8x (r1-r8); still the entry() smoke
    "retention_ttl",             # certified 7x
    "configurable_delete_json",  # certified 8x
    "token_range_filter",        # certified 8x
    "embedding_dedup_resolve",   # certified 7x
    "ann_ivf_topk",              # certified 7x
    "range_join_incidents",      # certified 7x
    "q4_order_priority",         # certified 8x
    "acctbal_percentiles",       # certified 8x
    "media_dedup",               # certified 7x
    "dedup_clusters_star",       # certified 4x (r5-r8)
    "training_corpus_assembly",  # certified 4x
    "sketch_heavy_hitters",      # certified 4x
    "runstore_leveled_view",     # certified 4x
    "dedup_incremental_lsh",     # certified 4x
    "bm25_search",               # certified 4x
    "sequence_packing",          # certified 4x
    "dedup_winnowing",           # certified 4x
    "events_funnel",             # certified 4x
    "contamination_report",      # certified 4x
    "cdc_apply",                 # certified 3x (r6-r8)
    "tombstone_compaction",      # certified 3x
    "bucketed_colocated_join",   # certified 3x (r2, r7, r8)
    "q9_product_type_profit",    # certified 3x
]
_WINDOW_ROTATE_IN_R9 = [
    "ann_ivfpq_topk",
    "ivfpq_persisted_probe",
    "ivfpq_streaming_index",
    "dedup_jaccard_routed",
    "jaccard_route_advisory",
    "bpe_token_profile",
    "ann_pq_rerank_topk",
    "quality_classifier_eval",
    "q8_market_share",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_relation",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_idle_balances",
    "pii_redaction",
    "pii_audit_report",
    "retention_rule_impact",
]


def _rotate_driver_window_r9() -> None:
    names = list(QUERIES)
    missing = [
        n for n in _WINDOW_ROTATE_IN_R9 + _WINDOW_ROTATE_OUT_R9 if n not in QUERIES
    ]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_ROTATE_OUT_R9)]
    prefix += _WINDOW_ROTATE_IN_R9
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r9()


# ---------------------------------------------------------------------------
# Bottom-k (KMV) sample sketch, round 9 additions (append-only AFTER the r9
# rotation: new registrations land past the driver window and enter a future
# rotation once locally certified)
# ---------------------------------------------------------------------------

_BK_HASH_SQL = (
    "CAST(('0x' || substring(md5('bk:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)
_BK_SAMPLE_SQL = f"""
    SELECT {_BK_HASH_SQL} AS h, doc_id, n_chars
    FROM documents
    ORDER BY h ASC, doc_id ASC LIMIT 256
"""


@query("bottomk_sample_docs", oracle=_BK_SAMPLE_SQL)
def bottomk_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k (K-minimum-values) row sample over the
    corpus: the 256 documents with the smallest portable keyed hash.
    This is the distribution-shape member of the sketch-table family
    (CM = frequency, HLL = cardinality, bottom-k = quantiles): a fixed
    256-row object that any consumer reads instead of the 100 TB table,
    uniform because md5 is uniform over keys, replayable because the hash
    is portable, and MERGEABLE — shard-local bottom-k's roll up losslessly
    (hash-certified by bottomk_shard_merge sharing this oracle).  Scale:
    orderBy+limit compiles to TakeOrderedAndProject — per-partition O(k)
    heaps, only #partitions·k rows move.  Reference anchor: the
    reference's key-count estimates ride sstable metadata
    (SSTableReader.getEstimatedKeys analog) — fixed-size summaries
    maintained where the data lives, consulted instead of the data."""
    from cassandra_util_spark.operators.sketches import bottomk_sample

    d = _t(spark, sf_dir, "documents")
    return bottomk_sample(d, "doc_id", k=256, payload=("n_chars",))


@query("bottomk_shard_merge", oracle=_BK_SAMPLE_SQL)
def bottomk_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability certified: the corpus splits into three disjoint
    shards (doc_id % 3 — the incremental-ingest shape), each shard keeps
    only its own bottom-256, and the merge of the three 256-row sketches
    hash-matches the direct whole-corpus sample (the SAME oracle as
    bottomk_sample_docs).  This closure property is the entire point of
    the sketch: per-shard/per-batch maintenance never rescans history,
    and a 1000-shard corpus rolls up through 1000·k rows, not N."""
    from cassandra_util_spark.operators.sketches import bottomk_merge, bottomk_sample

    d = _t(spark, sf_dir, "documents")
    shards = [
        bottomk_sample(d.filter(F.col("doc_id") % 3 == i), "doc_id", k=256,
                       payload=("n_chars",))
        for i in range(3)
    ]
    return bottomk_merge(*shards, k=256, key_col="doc_id")


@query(
    "quantile_sketch_doclen",
    oracle=f"""
    WITH s AS ({_BK_SAMPLE_SQL}),
    r AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rn,
             count(*) OVER () AS n
      FROM s)
    SELECT p, CAST(n_chars AS BIGINT) AS estimate
    FROM r JOIN (VALUES (0.1),(0.25),(0.5),(0.75),(0.9),(0.99)) t(p)
      ON rn = CAST(floor(p * (n - 1)) AS INT) + 1
    """,
)
def quantile_sketch_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length quantiles estimated from the 256-row bottom-k
    sample — P10..P99 of a 100 TB table for the cost of reading 256 rows.
    The estimate rule is exact-integer (rank = floor(p·(n−1))+1 under the
    total (value, key) order), so the sketch-derived quantiles replay
    bit-identically in SQL; accuracy vs the exact distribution is pinned
    in tests/test_bottomk.py (rank error ~ O(1/sqrt(k))).  This is the
    sketch the adaptive-length-bound and shard-planning operators would
    consult at scale instead of their exact percentile scans."""
    from cassandra_util_spark.operators.sketches import (
        bottomk_sample,
        sample_quantiles,
    )

    d = _t(spark, sf_dir, "documents")
    s = bottomk_sample(d, "doc_id", k=256, payload=("n_chars",))
    return sample_quantiles(s, "n_chars", key_col="doc_id").select(
        "p", F.col("estimate").cast("bigint").alias("estimate")
    )


@query("bottomk_streaming_sample", oracle=None)
def bottomk_streaming_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bottom-k maintenance end to end: the corpus replays
    through a real file-source stream in three micro-batches (doc_id % 3),
    each batch contributes its own 256-row bottom-k, the persisted sample
    store merges k-vs-k under the exactly-once snapshot protocol
    (replayed batch ids skip; fresh-checkpoint identity mismatch raises),
    and the drained store hash-matches the SAME oracle as the direct
    whole-corpus sample — the KMV closure property through the streaming
    path, the same triple-certification shape as the IVFADC family
    (in-memory / sharded / streamed, one oracle)."""
    import tempfile

    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import stream_bottomk_to_store

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    src = _pinned_shard_src(
        [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
        ["doc_id", "n_chars"],
        "bk-stream",
    )
    store = SnapshotStore(tempfile.mkdtemp(prefix="bk-store-"))
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "shard-*"))
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_bottomk_to_store(
            stream, store, tempfile.mkdtemp(prefix="bk-cp-"), "doc_id",
            k=256, payload=("n_chars",),
        )
        q.awaitTermination(300)
    return store.read(spark).select("h", "doc_id", "n_chars")


ORACLES["bottomk_streaming_sample"] = _BK_SAMPLE_SQL


@query(
    "quantile_sketch_by_lang",
    oracle=f"""
    WITH s AS (
      SELECT * FROM (
        SELECT lang, {_BK_HASH_SQL} AS h, doc_id, n_chars,
               row_number() OVER (
                 PARTITION BY lang
                 ORDER BY {_BK_HASH_SQL} ASC, doc_id ASC) AS rn
        FROM documents) WHERE rn <= 64),
    r AS (
      SELECT lang, n_chars,
             row_number() OVER (
               PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS vr,
             count(*) OVER (PARTITION BY lang) AS n
      FROM s)
    SELECT lang, p, CAST(n_chars AS BIGINT) AS estimate
    FROM r JOIN (VALUES (0.25),(0.5),(0.75),(0.9)) t(p)
      ON vr = CAST(floor(p * (n - 1)) AS INT) + 1
    """,
)
def quantile_sketch_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantiles from per-group bottom-64
    samples — the per-domain distribution monitor: a corpus with hundreds
    of languages reduces to a groups·k-row sketch, and each group's
    P25/P50/P75/P90 replays bit-identically in SQL (grouped KMV sample +
    exact-integer rank rule).  One shuffle on the group key; per-group
    window state is O(k).  At 100 TB this is how per-domain length gates
    (adaptive_length_bounds) and mixture planning consult distribution
    shape without per-domain percentile scans."""
    from cassandra_util_spark.operators.sketches import (
        bottomk_sample_grouped,
        sample_quantiles_grouped,
    )

    d = _t(spark, sf_dir, "documents")
    s = bottomk_sample_grouped(d, "lang", "doc_id", k=64, payload=("n_chars",))
    return sample_quantiles_grouped(s, "lang", "n_chars", key_col="doc_id").select(
        "lang", "p", F.col("estimate").cast("bigint").alias("estimate")
    )


from contextlib import contextmanager  # noqa: E402


@contextmanager
def _scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Scope spark.sql.shuffle.partitions to a streaming drain and restore
    it after — the state/shuffle-partition sizing lever (r9): per-batch
    joins/windows at contract-query shard sizes pay pure per-task overhead
    under the session's 32 partitions, and state partitioning is a
    per-checkpoint runtime knob, not an operator property.  Results are
    partition-count-invariant (every consumer hash-verifies unchanged)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@query(
    "ann_ivfpq_filtered",
    oracle=_ivfpq_oracle_sql(
        cand_join="JOIN embeddings el ON el.vec_id = e.vec_id",
        cand_where="el.label % 2 = 0",
    ),
)
def ann_ivfpq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: IVFADC top-k among only the vectors whose
    metadata matches a predicate (label % 2 = 0 — the lang/date/source-
    scoped retrieval shape).  The allowed-id set semi-joins the 8·m-byte
    codes BEFORE ADC scoring, so predicate selectivity cuts scan work
    instead of recall — a post-shortlist filter would return fewer than k
    under selective predicates, the classic filtered-ANN failure mode.
    The model (centroids + codebooks) still trains on the full corpus, so
    filtered and unfiltered searches share one index; the oracle replays
    the identical chain with the same filter injected at the same stage.
    """
    from cassandra_util_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf_dir, "embeddings")
    allowed = e.filter(F.col("label") % 2 == 0).select("vec_id")
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") < 5),
        k=10, coarse_k=16, nprobe=4, m=8, num_codes=16, rerank=64,
        candidates=allowed,
    )


@query(
    "weighted_sample_docs",
    oracle="""
    WITH w AS (
      SELECT doc_id, n_chars, CAST(n_chars // 16 + 1 AS INT) AS wt
      FROM documents),
    p AS (
      SELECT doc_id, wt, n_chars,
             list_min(list_transform(range(1, wt + 1),
               i -> CAST(('0x' || substring(md5('wbk:' || CAST(doc_id AS VARCHAR)
                          || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT))) AS pri
      FROM w)
    SELECT pri, doc_id, wt, n_chars FROM p ORDER BY pri ASC, doc_id ASC LIMIT 128
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted document sample WITHOUT replacement
    (Efraimidis-Spirakis 2006, exact integer form): each document's
    priority is the min of (n_chars/16 + 1) keyed hashes — min of w
    uniforms ~ u^(1/w), the E-S priority — and the 128 smallest win.
    This is the curation sampler: longer documents are proportionally
    likelier, the draw replays bit-for-bit in SQL (integer hash minima,
    no pow/ln priorities whose last ulp differs across engines), and
    shard samples merge losslessly like every bottom-k.  The weight
    bucketing (div 16 + 1) is the documented cost control: priority cost
    is ∝ sum(weights), so unbounded raw weights get bucketed upstream."""
    from cassandra_util_spark.operators.sketches import weighted_bottomk_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "wt", (F.col("n_chars") / F.lit(16)).cast("int") + F.lit(1)
    )
    return weighted_bottomk_sample(
        d, "doc_id", "wt", k=128, payload=("n_chars",), seed="wbk"
    )


@query(
    "adaptive_length_bounds_sketch",
    oracle=f"""
    WITH s AS (
      SELECT * FROM (
        SELECT lang, {_BK_HASH_SQL} AS h, doc_id, n_chars,
               row_number() OVER (
                 PARTITION BY lang
                 ORDER BY {_BK_HASH_SQL} ASC, doc_id ASC) AS rn
        FROM documents) WHERE rn <= 64),
    r AS (
      SELECT lang, n_chars,
             row_number() OVER (
               PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS vr,
             count(*) OVER (PARTITION BY lang) AS n
      FROM s),
    q AS (
      SELECT lang, p, CAST(n_chars AS BIGINT) AS est
      FROM r JOIN (VALUES (0.05),(0.95)) t(p)
        ON vr = CAST(floor(p * (n - 1)) AS INT) + 1),
    b AS (
      SELECT lang,
             max(CASE WHEN p = 0.05 THEN est END) AS lo,
             max(CASE WHEN p = 0.95 THEN est END) AS hi
      FROM q GROUP BY lang),
    stats AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    k AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN b ON b.lang = d.lang
      WHERE d.n_chars BETWEEN b.lo AND b.hi
      GROUP BY d.lang)
    SELECT b.lang, b.lo, b.hi, s.n_docs,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM b JOIN stats s USING (lang) LEFT JOIN k ON k.lang = b.lang
    """,
)
def adaptive_length_bounds_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive_length_bounds gate driven by the bottom-k quantile
    SKETCH instead of exact per-group percentile scans: per-language
    [p05, p95] estimated from each language's 64-row KMV sample
    (exact-integer rank rule, so the sketch-derived bounds replay
    bit-identically in SQL), then the same broadcast gate join counts
    what each band keeps.  This is the sketch-consumer path at 100 TB: the
    bounds cost groups·k rows regardless of corpus size, and
    tests/test_bottomk.py pins the estimates' rank accuracy against the
    exact CDF.  The exact-percentile variant stays certified alongside
    (adaptive_length_bounds) — pick by whether the stratum is scan-cheap."""
    from cassandra_util_spark.operators.sketches import (
        bottomk_sample_grouped,
        sample_quantiles_grouped,
    )

    d = _t(spark, sf_dir, "documents")
    s = bottomk_sample_grouped(d, "lang", "doc_id", k=64, payload=("n_chars",))
    est = sample_quantiles_grouped(
        s, "lang", "n_chars", probs=(0.05, 0.95), key_col="doc_id"
    )
    b = est.groupBy("lang").agg(
        F.max(F.when(F.col("p") == 0.05, F.col("estimate"))).cast("bigint").alias("lo"),
        F.max(F.when(F.col("p") == 0.95, F.col("estimate"))).cast("bigint").alias("hi"),
    )
    stats = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    kept = (
        d.join(F.broadcast(b), "lang")
        .filter(F.col("n_chars").between(F.col("lo"), F.col("hi")))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        b.join(stats, "lang")
        .join(kept, "lang", "left")
        .select(
            "lang", "lo", "hi", "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Round-11 driver-window rotation (VERDICT r10 task 1): certification
# stalled at 114/175 because round 10 skipped the rotation; two rounds of
# candidates queue behind one window.  Rotate OUT 24 rows all driver-
# certified at least three times (the r6/r7 cohort at 4-5 certifications
# plus eight thrice-certified r8 rows), rotate IN the 24 highest-value
# never-driver-checked rows: the eight r9 sketch/weighted/filtered-ANN
# additions (all hash-certified locally in r9 AND re-certified by the r10
# judge after the seed/survivor fixes), the six corpus planners, and the
# ten oldest tail rows the verdict names.  Family coverage in the window is
# preserved: retention (retention_rule_impact stays), streaming
# (ivfpq_streaming_index + bottomk_streaming_sample + corpus planners'
# batch forms), dedup (dedup_jaccard_routed + dedup_edit_distance),
# ANN (IVFPQ trio + ann_rp_rerank + ann_ivfpq_filtered), sketches
# (HLL/CM/bottom-k now all driver-checked for the first time), TPC-H
# (q2 joins the q8-q22 block), LSM layout (runstore_compaction_view,
# runstore_zorder_2d).  Registrations after this block are APPEND-ONLY:
# they land past the window and enter a future rotation once locally
# certified (same rule as r9; tests/test_plan_hygiene.py pins the prefix).
# ---------------------------------------------------------------------------

_WINDOW_ROTATE_OUT_R11 = [
    "hybrid_retrieval_rrf",       # certified 5x (r6-r10)
    "dsir_select",                # certified 5x
    "cluster_aware_split",        # certified 5x
    "dedup_incremental",          # certified 5x
    "events_incremental_rollup",  # certified 5x
    "join_plan_advisory",         # certified 5x
    "unicode_nfc_fingerprints",   # certified 5x
    "advised_join_exec",          # certified 4x (r7-r10)
    "counter_store_totals",       # certified 4x
    "zorder_layout_key",          # certified 4x
    "runstore_skipindex_view",    # certified 4x
    "twcs_retention_view",        # certified 4x
    "q7_volume_shipping",         # certified 4x
    "corpus_clean_pipeline",      # certified 4x
    "gopher_quality_gate",        # certified 4x
    "events_cohort_retention",    # certified 4x
    "semantic_dedup_scaled",      # certified 3x (r8-r10)
    "twcs_streaming_view",        # certified 3x
    "dedup_streaming_lsh",        # certified 3x
    "corpus_ingest_streaming",    # certified 3x
    "dedup_ngram_prefix",         # certified 3x
    "ann_pq_adc_topk",            # certified 3x
    "bpe_learned_merges",         # certified 3x
    "quality_classifier_scores",  # certified 3x
]
_WINDOW_ROTATE_IN_R11 = [
    # the eight r9 additions, never driver-checked
    "bottomk_sample_docs",
    "bottomk_shard_merge",
    "quantile_sketch_doclen",
    "bottomk_streaming_sample",
    "quantile_sketch_by_lang",
    "weighted_sample_docs",
    "adaptive_length_bounds_sketch",
    "ann_ivfpq_filtered",
    # the oldest never-driver-checked tail (VERDICT r10 task 1 list)
    "sketch_hll_registers",
    "sketch_hll_per_type",
    "sketch_count_min_users",
    "ivf_persisted_probe",
    "runstore_compaction_view",
    "runstore_zorder_2d",
    "embedding_rp_project",
    "ann_rp_rerank",
    "q2_min_cost_supplier",
    "dedup_edit_distance",
    # the corpus planners
    "corpus_gate_report",
    "corpus_shard_plan",
    "corpus_lang_profile",
    "corpus_split_assignment",
    "corpus_token_budget",
    "corpus_zipf_audit",
]


def _rotate_driver_window_r11() -> None:
    names = list(QUERIES)
    missing = [
        n for n in _WINDOW_ROTATE_IN_R11 + _WINDOW_ROTATE_OUT_R11 if n not in QUERIES
    ]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_ROTATE_OUT_R11)]
    prefix += _WINDOW_ROTATE_IN_R11
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r11()


# --- Round-12 window rotation (VERDICT r11 task 1: finish certification) ---
#
# The r11 verdict counted 138 of 175 queries ever driver-certified and named
# the 37-query tail that has NEVER been in a driver window.  The window holds
# 50, so ALL 37 fit in one rotation alongside 13 re-certification rows — the
# 13 least-recently-certified queries in the registry (ten last certified in
# round 4, plus the alphabetically-first three of the round-5 cohort as the
# tiebreak).  Every current window row was certified in r11, so the entire
# 50-row window rotates out; each rotates out multiply-certified.
_WINDOW_ROTATE_OUT_R12 = [
    # r11-certified (every row below was green in CORRECTNESS_r11.json)
    "pareto_document_selection",
    "stream_interval_join_view",
    "ann_ivfpq_topk",
    "ivfpq_persisted_probe",
    "ivfpq_streaming_index",
    "dedup_jaccard_routed",
    "jaccard_route_advisory",
    "bpe_token_profile",
    "ann_pq_rerank_topk",
    "quality_classifier_eval",
    "q8_market_share",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_relation",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_idle_balances",
    "pii_redaction",
    "pii_audit_report",
    "retention_rule_impact",
    "bottomk_sample_docs",
    "bottomk_shard_merge",
    "quantile_sketch_doclen",
    "bottomk_streaming_sample",
    "quantile_sketch_by_lang",
    "weighted_sample_docs",
    "adaptive_length_bounds_sketch",
    "ann_ivfpq_filtered",
    "sketch_hll_registers",
    "sketch_hll_per_type",
    "sketch_count_min_users",
    "ivf_persisted_probe",
    "runstore_compaction_view",
    "runstore_zorder_2d",
    "embedding_rp_project",
    "ann_rp_rerank",
    "q2_min_cost_supplier",
    "dedup_edit_distance",
    "corpus_gate_report",
    "corpus_shard_plan",
    "corpus_lang_profile",
    "corpus_split_assignment",
    "corpus_token_budget",
    "corpus_zipf_audit",
]
_WINDOW_ROTATE_IN_R12 = [
    # 13 re-certification rows: least-recently driver-certified
    "dedup_fingerprint",  # last certified r4
    "dedup_ngram_jaccard_capped",  # r4
    "events_json_props",  # r4
    "media_frame_plan",  # r4
    "odd_pk_filter",  # r4
    "orders_profile",  # r4
    "orders_status_rollup",  # r4
    "paged_fetch",  # r4
    "token_count_regex",  # r4
    "writetime_projection",  # r4
    "ann_cosine_topk",  # r5 (alphabetical tiebreak within the r5 cohort)
    "dedup_exact",  # r5
    "dedup_simhash",  # r5
    # the complete 37-query never-driver-checked tail (VERDICT r11 list)
    "acctbal_histogram_percentiles",
    "adaptive_length_bounds",
    "bigram_lm_quality",
    "bm25_batch_search",
    "commonness_buckets",
    "decontamination",
    "dedup_cluster_sizes",
    "dedup_clusters",
    "dedup_fingerprint_longest",
    "dedup_incremental_bloom",
    "dedup_ngram_containment",
    "dedup_soft_keep",
    "dedup_span_removal",
    "dedup_within_doc_spans",
    "doc_chunks",
    "doc_commonness",
    "doc_length_histogram",
    "doc_repetition_filter",
    "doc_top_terms",
    "embedding_mean_pool",
    "embedding_prototypes",
    "events_activity_anomalies",
    "events_cube_profile",
    "events_skew_report",
    "events_sliding_window_sum",
    "events_zorder_layout",
    "hard_negatives",
    "lang_confusion_matrix",
    "mixture_temperature_plan",
    "orders_ledger_reconciliation",
    "orders_rollup_totals",
    "passage_dup_share",
    "passage_retrieval",
    "retrieval_eval",
    "stratified_sample_docs",
    "stratified_topk_docs",
    "weighted_repeat_docs",
]


def _rotate_driver_window_r12() -> None:
    names = list(QUERIES)
    missing = [
        n for n in _WINDOW_ROTATE_IN_R12 + _WINDOW_ROTATE_OUT_R12 if n not in QUERIES
    ]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    prefix = [n for n in names[:50] if n not in set(_WINDOW_ROTATE_OUT_R12)]
    prefix += _WINDOW_ROTATE_IN_R12
    # explicit raise, not a bare assert: under `python -O` an assert is
    # stripped and a rotate-in already inside the kept prefix would corrupt
    # the window silently at import (r11 ADVICE finding).
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r12()


# --- Round-12 additions (registered after the rotation: appended past the
# --- window, so the certified 50-name prefix is untouched) ---------------

def _weighted_logcost_oracle() -> str:
    from cassandra_util_spark.operators.sketches import (
        weighted_logcost_priority_sql,
    )

    pri = weighted_logcost_priority_sql("doc_id", "wt", seed="wlc")
    return f"""
    WITH w AS (
      SELECT doc_id, n_chars, CAST(n_chars AS BIGINT) * 1811 AS wt
      FROM documents)
    SELECT {pri} AS pri, doc_id, wt, n_chars
    FROM w ORDER BY pri ASC, doc_id ASC LIMIT 128
    """


@query("weighted_sample_logcost", oracle=_weighted_logcost_oracle())
def weighted_sample_logcost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count-weighted document sample at REALISTIC weights
    (n_chars·1811 ≈ 10^5-10^6 — the range the replica-form sampler's
    10,000 guard rejects by design): Efraimidis-Spirakis without
    replacement via the log-cost binary-block priority, the 128 smallest
    win.  Each weight bit contributes one block minimum drawn exactly by
    j nested IEEE-correctly-rounded sqrts, so per-row cost is O(log²w)
    regardless of the weight's magnitude and the draw still replays
    bit-for-bit in SQL (the oracle's unrolled priority is generated from
    the same loop).  This closes the engine's last 100 TB cost caveat:
    sampling by token counts no longer costs ∝ sum(weights)."""
    from cassandra_util_spark.operators.sketches import (
        weighted_bottomk_sample_logcost,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "wt", F.col("n_chars").cast("bigint") * F.lit(1811)
    )
    return weighted_bottomk_sample_logcost(
        d, "doc_id", "wt", k=128, payload=("n_chars",), seed="wlc"
    )


@query("logcost_streaming_sample", oracle=None)
def logcost_streaming_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the LOG-COST weighted sample end to end:
    the corpus replays through a real file-source stream in three
    micro-batches at token-count-scale weights (n_chars·1811 ≈ 10^5-10^6
    — past the replica form's guard), each batch contributes its own
    O(log²w)-priority bottom-k, the persisted store merges k-vs-k under
    the exactly-once snapshot protocol with the weight FORM pinned in the
    sampler identity, and the drained store hash-matches the SAME oracle
    as the direct whole-corpus `weighted_sample_logcost` — the E-S
    closure through the streaming path, the triple-certification shape
    of the bottom-k family (batch / shard-merge / streamed, one oracle)."""
    import tempfile

    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import stream_bottomk_to_store

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("n_chars").cast("bigint") * F.lit(1811)).alias("wt"),
        "n_chars",
    )
    src = _pinned_shard_src(
        [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
        ["doc_id", "wt", "n_chars"],
        "lc-stream",
    )
    store = SnapshotStore(tempfile.mkdtemp(prefix="lc-store-"))
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "shard-*"))
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_bottomk_to_store(
            stream, store, tempfile.mkdtemp(prefix="lc-cp-"), "doc_id",
            k=128, payload=("n_chars",), weight_col="wt",
            weight_form="logcost", seed="wlc",
        )
        q.awaitTermination(300)
    return store.read(spark).select("pri", "doc_id", "wt", "n_chars")


ORACLES["logcost_streaming_sample"] = _weighted_logcost_oracle()


def _weighted_grouped_oracle() -> str:
    from cassandra_util_spark.operators.sketches import (
        weighted_logcost_priority_sql,
    )

    pri = weighted_logcost_priority_sql("doc_id", "wt", seed="wlc")
    return f"""
    WITH w AS (
      SELECT lang, doc_id, n_chars, CAST(n_chars AS BIGINT) * 1811 AS wt
      FROM documents),
    p AS (
      SELECT lang, {pri} AS pri, doc_id, wt, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {pri} ASC, doc_id ASC) AS rn
      FROM w)
    SELECT lang, pri, doc_id, wt, n_chars FROM p WHERE rn <= 16
    """


@query("weighted_sample_by_lang", oracle=_weighted_grouped_oracle())
def weighted_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified token-weighted curation sample: each language keeps its
    own 16 Efraimidis-Spirakis winners at token-count-scale weights
    (n_chars·1811, the log-cost priority) in ONE pass — the per-domain
    form of `weighted_sample_logcost`, and the weighted form of
    `quantile_sketch_by_lang`'s grouped KMV machinery.  Priorities are
    pure (seed, key, weight) functions, so each stratum's sample is
    bit-identical to a filtered global run and replays exactly in SQL.
    One shuffle on the group key, O(k) window state per group: 200
    languages at 100 TB reduce to a 200·k-row weighted sample without
    200 filtered passes."""
    from cassandra_util_spark.operators.sketches import (
        weighted_bottomk_sample_grouped,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "wt", F.col("n_chars").cast("bigint") * F.lit(1811)
    )
    return weighted_bottomk_sample_grouped(
        d, "lang", "doc_id", "wt", k=16, payload=("n_chars",), seed="wlc"
    )


@query(
    "corpus_budget_cut",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {_REGEX_TOKS_SQL} AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks,
             CAST(sum(toks) OVER (
               ORDER BY doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM t)
    SELECT doc_id, toks, cum_tokens FROM c WHERE cum_tokens - toks < 20000
    """,
)
def corpus_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget cut WITHOUT the single-task global window: keep
    documents in doc_id order while the running token total before each
    stays under 20,000 — the assembly pipeline's budget semantics (the
    crossing document is the last one kept), computed by the two-phase
    distributed prefix sum (`functions/cumsum.py`: range partition →
    per-partition local cumsum in N parallel groups → N-row offset table
    broadcast back).  The oracle replays the same cut with a plain SQL
    running sum, certifying that the distributed decomposition is
    bit-equal to the single-task form it replaces at scale."""
    from cassandra_util_spark.functions.cumsum import token_budget_cut

    d = _t(spark, sf_dir, "documents")
    toks = _tokcount(F.col("text"))
    return token_budget_cut(
        d.select("doc_id", toks.alias("toks")), ["doc_id"], "toks",
        budget=20_000,
    )


@query(
    "padding_waste_report",
    oracle=f"""
    WITH t AS (
      SELECT {_REGEX_TOKS_SQL} AS toks
      FROM documents),
    b AS (
      SELECT toks,
             CASE WHEN toks > 8192 THEN -1
                  ELSE list_min(list_filter(
                         [64,128,256,512,1024,2048,4096,8192],
                         v -> v >= toks)) END AS bucket
      FROM t),
    agg AS (
      SELECT bucket, count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM b GROUP BY bucket)
    SELECT bucket, n_docs, n_tokens,
           CASE WHEN bucket > 0 THEN bucket * n_docs END AS padded_slots,
           CASE WHEN bucket > 0 THEN bucket * n_docs - n_tokens END
             AS wasted_slots,
           CASE WHEN bucket > 0 THEN round((bucket * n_docs - n_tokens)
                 / CAST(bucket * n_docs AS DOUBLE), 6) END AS waste_share
    FROM agg
    """,
)
def padding_waste_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-cost accounting for fixed-length batching: every document
    assigned to the smallest power-of-two bucket ≥ its token count (64 to
    8192; longer goes to the oversize bucket) with per-bucket document
    count, real tokens, padded slots, wasted slots, and waste share — the
    evidence behind choosing a bucket ladder (or switching to packing)
    for SFT/eval workloads where documents must stay whole.  Bucket
    selection is exact INTEGER comparison over the candidate ladder —
    never ceil(log2(double)), whose last ulp differs between engines on
    exact powers — so the whole report replays bit-identically in SQL.
    One partial-aggregate pass; ≤ 9 output rows at any corpus size."""
    from cassandra_util_spark.operators.packing import padding_waste_report

    d = _t(spark, sf_dir, "documents")
    toks = _tokcount(F.col("text"))
    return padding_waste_report(d.select(toks.alias("toks")), "toks")


@query(
    "mixture_budget_execution",
    oracle=f"""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             round(sqrt(n_docs / CAST((SELECT sum(n_docs) FROM c) AS DOUBLE)), 6) AS wd
      FROM c),
    z AS (
      SELECT source,
             round(wd / CAST((SELECT sum(CAST(wd AS DECIMAL(18,6))) FROM w) AS DOUBLE),
                   6) AS weight
      FROM w),
    budgets AS (
      SELECT source, CAST(floor(weight * 18000) AS BIGINT) AS budget FROM z),
    t AS (
      SELECT source, doc_id,
             {_REGEX_TOKS_SQL} AS toks
      FROM documents),
    cum AS (
      SELECT source, doc_id, toks,
             CAST(sum(toks) OVER (
               PARTITION BY source ORDER BY doc_id ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t)
    SELECT cum.source, doc_id, toks, cum_tokens, budget
    FROM cum JOIN budgets ON cum.source = budgets.source
    WHERE cum_tokens - toks < budget
    """,
)
def mixture_budget_execution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planner → executor link for mixture building: the
    temperature-mixture advisory says WHAT share each source gets
    (`mixture_temperature_plan`'s 6dp weights); this turns those shares
    into per-source token budgets (weight × an 18k-token target, floored)
    and materializes exactly WHICH documents realize them — per-source
    running token totals in doc_id order, keep while the total before
    each document is under its source's budget (the crossing document is
    the last kept, the `token_budget_cut` rule per group).  Same pattern
    as join_plan_advisory → advised_join_exec: advice certified, then
    the execution of that advice certified on the same data.  One
    shuffle on the source key; per-source windows parallelize; the plan
    table is |sources| rows, broadcast.  A source holding ≥50% of the
    corpus auto-routes through the distributed prefix sum instead of
    serializing its own window (r13; balanced plans like this one are
    plan-unchanged, pinned in tests/test_cumsum.py)."""
    from cassandra_util_spark.functions.cumsum import apply_token_budgets

    plan = QUERIES["mixture_temperature_plan"](spark, sf_dir)
    budgets = plan.select(
        "source", F.floor(F.col("weight") * F.lit(18_000)).cast("bigint").alias("budget")
    )
    d = _t(spark, sf_dir, "documents")
    toks = _tokcount(F.col("text"))
    docs = d.select("source", "doc_id", toks.alias("toks"))
    return apply_token_budgets(docs, budgets, "source", ["doc_id"], "toks")


@query(
    "dedup_token_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
            FROM toks WHERE len(w) >= 8)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    anchors AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
    islands AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS island
      FROM anchors)
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end,
           CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens
    FROM islands GROUP BY doc_id, island
    """,
)
def dedup_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans at TOKEN granularity (the Lee et al. 2022
    excision shape): for each document, the maximal token ranges whose
    every 8-gram occurs more than once in the corpus — exact 0-based
    offsets via the gaps-and-islands integer trick, finer than the
    32-word chunk grid of `dedup_span_removal`/`dedup_within_doc_spans`
    (catches spans straddling chunk boundaries, reports true extents).
    One n-gram explode into a combiner-reduced gram count, anchors
    semi-joined back (∝ duplicated volume only), per-document islands
    parallel across documents."""
    from cassandra_util_spark.operators.dedup import duplicated_token_spans

    d = _t(spark, sf_dir, "documents")
    return duplicated_token_spans(d, "doc_id", "text", n=8)


# --- Round-13 driver-window rotation (VERDICT r12 task 1: finish
# --- cumulative certification at 182/182) --------------------------------
#
# Rotate OUT: the entire round-12 window (all 50 rows green in
# CORRECTNESS_r12 — rows + schema + value-hash — and green in the
# committed 182/182 local oracle).  37 of them were first-time
# certifications in r12; the r12 verdict explicitly directs this full
# turnover so the 7 never-driver-checked round-12 additions plus the 43
# least-recently-certified rows fill the window.
#
# Rotate IN (50): the 7 round-12 additions (log-cost weighted-sampler
# family, corpus budget cut, padding-waste report, mixture executor,
# token-granular duplicated spans) followed by the 43 rows whose last
# driver certification is oldest (r5: 7 rows, r6: 10, r7: 10, r8: 16 —
# computed from CORRECTNESS_r01..r12; ties broken by certification count
# then registration order).  A green CORRECTNESS_r13 makes cumulative
# driver certification 182/182.
#
# Family coverage in the window is preserved: retention (antijoin +
# mixed-key TTL), dedup (exact-set-ops, minhash-LSH, incremental LSH,
# winnowing, jaccard, clusters-star, token spans), embeddings
# (quantize, neardup, semantic), TPC-H (q1/q3/q5/q6/q9/q10), events
# (sessionize, funnel, gaps, hourly rollup), corpus pipeline (assembly,
# packing, budget cut, mixture executor), sketches (heavy hitters),
# runstore (leveled view), retrieval (bm25), counters, CDC, tombstone,
# LWW, as-of join, media, sampling (log-cost family).

_WINDOW_ROTATE_IN_R13 = [
    # never driver-checked (round-12 additions, all local-oracle green)
    "weighted_sample_logcost",
    "logcost_streaming_sample",
    "weighted_sample_by_lang",
    "corpus_budget_cut",
    "padding_waste_report",
    "mixture_budget_execution",
    "dedup_token_spans",
    # least-recently-certified re-certs (last certified r5)
    "embedding_quantize",
    "lang_id",
    "doc_fingerprint",
    "retention_rules_antijoin",
    "set_ops_except_intersect",
    "retention_ttl_mixed_keys",
    "events_user_gaps",
    # last certified r6
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_orders_per_customer",
    "events_hourly_rollup",
    "text_quality",
    "dedup_ngram_jaccard",
    "embedding_neardup",
    "events_sessionize",
    "asof_join_clicks_purchases",
    # last certified r7
    "semantic_dedup",
    "lww_merge",
    "counter_merge",
    "dedup_minhash_lsh",
    "q10_returned_items",
    "parts_above_avg_price",
    "q6_forecast_revenue",
    "orders_pivot_priority",
    "media_features",
    "salted_event_rollup",
    # last certified r8
    "cdc_apply",
    "tombstone_compaction",
    "q9_product_type_profit",
    "bucketed_colocated_join",
    "dedup_clusters_star",
    "training_corpus_assembly",
    "sketch_heavy_hitters",
    "runstore_leveled_view",
    "dedup_incremental_lsh",
    "bm25_search",
    "sequence_packing",
    "dedup_winnowing",
    "events_funnel",
    "contamination_report",
    "embedding_dedup_resolve",
    "media_dedup",
]


def _rotate_driver_window_r13() -> None:
    names = list(QUERIES)
    rotate_out = names[:50]  # the full r12 window turns over (see above)
    missing = [n for n in _WINDOW_ROTATE_IN_R13 if n not in QUERIES]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    already = [n for n in _WINDOW_ROTATE_IN_R13 if n in rotate_out]
    if already:  # explicit raise — a bare assert vanishes under python -O
        raise AssertionError(f"rotate-in already inside the kept prefix: {already}")
    prefix = list(_WINDOW_ROTATE_IN_R13)
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r13()


# --- Round-13 additions (registered after the rotation: appended past the
# --- window, so the certified 50-name prefix is untouched) ----------------

_BPE_BATCHED_N, _BPE_BATCH = 8, 4

_BPE_BATCHED_SELECT = "\nUNION ALL\n".join(
    f"SELECT {i - 1} AS step, lhs, rhs, lhs || rhs AS merged, c AS cnt FROM b{i}"
    for i in range(1, _BPE_BATCHED_N + 1)
)


@query(
    "bpe_learned_merges_batched",
    oracle=_bpe_batched_sql(_BPE_BATCHED_N, _BPE_BATCH, _BPE_BATCHED_SELECT),
)
def bpe_learned_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BPE training (VERDICT r12 task 6) — the production
    fast-trainer path (batch=16 measured 13× sequential throughput,
    SCALING.md), here at batch=4 over 8 merges so the full round
    structure (candidate pool, symbol-disjoint greedy selection, composed
    one-pass fold) is value-hash-certified against a DuckDB replay of the
    SAME batched algorithm — not just the batch=1 twin.  Within a round
    the composed fold equals sequential application because the taken
    pairs are symbol-disjoint; the oracle applies them sequentially and
    derives the selection independently (top-4·batch pool, exclusion
    joins), so a drift in pool sizing, tie order, or disjointness
    semantics breaks the hash."""
    from cassandra_util_spark.operators.bpe import bpe_merge_table, bpe_train

    d = _t(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, "text", num_merges=_BPE_BATCHED_N, batch=_BPE_BATCH)
    return bpe_merge_table(spark, merges)


@query(
    "dedup_token_spans_cross_doc",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
            FROM toks WHERE len(w) >= 8)),
    dup AS (SELECT g FROM grams GROUP BY g
            HAVING count(DISTINCT doc_id) >= 2),
    anchors AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
    islands AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS island
      FROM anchors)
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end,
           CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens
    FROM islands GROUP BY doc_id, island
    """,
)
def dedup_token_spans_cross_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-granular duplicated spans under the CROSS-DOCUMENT criterion:
    an n-gram anchors a span only when it occurs in ≥2 DISTINCT documents
    — the contamination/decontamination flavor of `dedup_token_spans`
    (within-document repetition, e.g. boilerplate chant or a chorus, is
    NOT excised; text shared with any other document is).  Same explode →
    combiner-reduced count → semi-join → gaps-and-islands shape; the only
    delta is count_distinct(doc_id) in the duplicate gate, which keeps
    the same one-shuffle scale profile (count_distinct over the gram key
    is a two-level partial aggregate, not a second shuffle of the corpus).
    Previously unit-tested only; this gives the scope its own value-hash
    contract.  On the sf0.01 fixture every duplicated 8-gram happens to
    be cross-document, so this hash equals `dedup_token_spans`' — the
    BEHAVIORAL divergence of the two scopes (within-doc repeats anchored
    by global, ignored by cross_doc) is pinned on a constructed corpus in
    tests/test_dedup_spans.py; this contract certifies that both engines
    flip the criterion consistently."""
    from cassandra_util_spark.operators.dedup import duplicated_token_spans

    d = _t(spark, sf_dir, "documents")
    return duplicated_token_spans(d, "doc_id", "text", n=8, scope="cross_doc")


@query(
    "token_spans_streaming_view",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
            FROM toks WHERE len(w) >= 8)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    anchors AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
    islands AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS island
      FROM anchors)
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end,
           CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens
    FROM islands GROUP BY doc_id, island
    """,
)
def token_spans_streaming_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental token-span excision end to end, hash-certified: the
    corpus replays through a real file-source stream in three
    micro-batches (batch k = doc_id % 3 == k) into a persisted GRAM-COUNT
    CounterStore (`stream_token_span_index`: each batch appends one
    additive delta run of its combiner-reduced gram counts, under the
    counter HWM replay guard), a compaction FOLD runs after the drain,
    and the full corpus probed against the store
    (`token_spans_from_store`) must hash-equal the single-job batch
    operator — the same streaming-equals-batch claim as
    `twcs_streaming_view`, here for ADDITIVE cross-batch state: a gram
    seen once in batch 0 and once in batch 2 counts as duplicated exactly
    like a same-batch repeat.  Per-shard production cost is the shard's
    grams plus a merge-on-read of the bounded count runs — historical
    CONTENT is never re-read, which is what lets a 100 TB crawl excise
    incrementally while the batch operator re-counts the corpus per run."""
    import tempfile

    from cassandra_util_spark.operators.counters import CounterStore
    from cassandra_util_spark.operators.dedup import token_spans_from_store
    from cassandra_util_spark.streaming.dedup import stream_token_span_index

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    src = _pinned_shard_src(
        [d.filter(F.col("doc_id") % 3 == k) for k in range(3)],
        ["doc_id", "text"],
        "spanstream",
    )
    cs = CounterStore(tempfile.mkdtemp(prefix="spanstore-"), ["g"], ["c"])
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_token_span_index(
            stream, cs, tempfile.mkdtemp(prefix="spanstream-cp-"),
            id_col="doc_id", text_col="text", n=8,
        )
        q.awaitTermination(300)
    cs.compact(spark)  # fold-invariance exercised on the certified path
    return token_spans_from_store(cs, d, "doc_id", "text", n=8)


@query(
    "dedup_token_spans_excised",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
            FROM toks WHERE len(w) >= 8)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    anchors AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
    islands AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS island
      FROM anchors),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      FROM islands GROUP BY doc_id, island),
    pos AS (
      SELECT doc_id, j - 1 AS pos, w[j] AS word
      FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS j FROM toks)),
    kept AS (
      SELECT p.doc_id, p.pos, p.word FROM pos p
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = p.doc_id
                          AND p.pos BETWEEN s.s AND s.e)),
    agg AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, len(w) AS n_tokens FROM toks)
    SELECT t.doc_id,
           coalesce(a.text, '') AS text,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.n_tokens - coalesce(a.n_kept, 0) AS BIGINT)
             AS n_tokens_removed
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_token_spans_excised(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXCISION completing the token-span detector (Lee et al. 2022):
    every token inside a ≥8-token duplicated region is dropped and the
    surviving normalized token stream re-joined — the actual
    training-text output of token-granular dedup, with per-document
    removal accounting.  Spans aggregate to one array per affected
    document (∝ duplicated volume) and LEFT-join back; the token filter
    is a single map-side array pass (zip positions, drop covered), so
    the only costs beyond detection are the span join and codegen'd
    array work.  Documents with no duplicated spans pass through intact;
    a fully-duplicated document survives as empty text with
    n_tokens_removed = n_tokens."""
    from cassandra_util_spark.operators.dedup import excise_token_spans

    d = _t(spark, sf_dir, "documents")
    return excise_token_spans(d, "doc_id", "text", n=8)


@query(
    "token_spans_incremental_excision",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
            FROM toks WHERE len(w) >= 8)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    anchors AS (
      SELECT doc_id, pos FROM grams JOIN dup USING (g)
      WHERE doc_id % 3 = 2),
    islands AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS island
      FROM anchors),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      FROM islands GROUP BY doc_id, island),
    shard AS (SELECT doc_id, w FROM toks WHERE doc_id % 3 = 2),
    pos AS (
      SELECT doc_id, j - 1 AS pos, w[j] AS word
      FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS j FROM shard)),
    kept AS (
      SELECT p.doc_id, p.pos, p.word FROM pos p
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = p.doc_id
                          AND p.pos BETWEEN s.s AND s.e)),
    agg AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, len(w) AS n_tokens FROM shard)
    SELECT t.doc_id,
           coalesce(a.text, '') AS text,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.n_tokens - coalesce(a.n_kept, 0) AS BIGINT)
             AS n_tokens_removed
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
)
def token_spans_incremental_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-dedup composition end to end, hash-certified:
    batches 0 and 1 (doc_id % 3) stream into the gram-count store as
    HISTORY, the arriving shard (batch 2) is ingested and then ONLY the
    shard is probed (`token_spans_from_store`) and excised
    (`excise_token_spans(spans=...)`) against the full accumulated
    counts — historical content is never re-read, and the shard's
    cleaned text must equal what a full batch recompute would produce
    for those documents (the oracle computes spans over the WHOLE corpus
    and excises the shard's slice).  This is the per-shard production
    loop of a 100 TB crawl: per arrival, cost ∝ shard grams + one
    merge-on-read of the bounded count runs."""
    import tempfile

    from cassandra_util_spark.operators.counters import CounterStore
    from cassandra_util_spark.operators.dedup import (
        excise_token_spans,
        gram_count_deltas,
        token_spans_from_store,
    )
    from cassandra_util_spark.streaming.dedup import stream_token_span_index

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    src = _pinned_shard_src(
        # HISTORY: batches 0 and 1
        [d.filter(F.col("doc_id") % 3 == k) for k in range(2)],
        ["doc_id", "text"],
        "increx",
    )
    cs = CounterStore(tempfile.mkdtemp(prefix="increx-store-"), ["g"], ["c"])
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_token_span_index(
            stream, cs, tempfile.mkdtemp(prefix="increx-cp-"),
            id_col="doc_id", text_col="text", n=8,
        )
        q.awaitTermination(300)
    shard = d.filter(F.col("doc_id") % 3 == 2)
    # the shard ingests first (its within-shard duplicates count too),
    # then only IT is probed and excised
    cs.append_increments(gram_count_deltas(shard, "doc_id", "text", n=8), name="b2")
    spans = token_spans_from_store(cs, shard, "doc_id", "text", n=8)
    return excise_token_spans(shard, "doc_id", "text", n=8, spans=spans)

# Shared oracle fragments for the tokenizer-family queries (review r13:
# the dw position-stream and segids word->id-list CTEs were hand-duplicated
# across three oracles -- the exact desync hazard the r12 ADVICE recorded
# for hand-inlined oracle SQL; one definition, interpolated everywhere).
_BPE_DW_CTE = f"""dw AS (SELECT doc_id, j - 1 AS pos, w[j] AS word
           FROM (SELECT doc_id,
                        list_filter(string_split({_NORM_SQL}, ' '),
                                    x -> x <> '') AS w
                 FROM documents) t, UNNEST(range(1, len(w) + 1)) u(j))"""

_BPE_SEGIDS_CTE = f"""segids AS (
      SELECT word, list(id ORDER BY j) AS ids
      FROM (SELECT w.word, t.j, w.s[t.j] AS sym
            FROM w{_BPE_N} w, UNNEST(range(1, len(w.s) + 1)) t(j)) q
      JOIN vocab v USING (sym)
      GROUP BY word)"""


@query(
    "bpe_encode_corpus",
    oracle=_bpe_sql(
        _BPE_N,
        f"""
    , {_BPE_DW_CTE},
    enc AS (
      SELECT d.doc_id,
             string_agg(array_to_string(s.s, ' '), ' ' ORDER BY d.pos)
               AS tokens,
             CAST(sum(len(s.s)) AS BIGINT) AS n_tokens
      FROM dw d JOIN w{_BPE_N} s ON s.word = d.word
      GROUP BY d.doc_id)
    SELECT doc.doc_id,
           coalesce(e.tokens, '') AS tokens,
           CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents doc LEFT JOIN enc e USING (doc_id)
    """,
    ),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORDERED BPE token stream per document under the learned
    vocabulary — the actual tokenizer output a training pipeline feeds to
    packing, completing the train → count → ENCODE family
    (`bpe_learned_merges` certifies the merges, `bpe_token_profile` the
    budget counts; this certifies the stream itself, rendered as the
    space-joined token text plus its length).  Encoding stays
    vocabulary-local: the corpus's distinct words join to their trained
    segmentation (no per-document re-segmentation), the position-indexed
    word stream re-assembles ordered in one (id)-keyed shuffle ∝ corpus
    tokens — the information floor for producing the stream — and
    documents with no tokens survive as empty streams.  The
    out-of-vocabulary half (`segment_words`: learned merges replayed in
    order via contiguous symbol-disjoint composed folds, exactly the
    semantics the trainer left in the word table) is exercised and
    reference-pinned in tests/test_bpe_encode.py; here train and encode
    share the corpus, so the oracle replays the trained table."""
    from cassandra_util_spark.operators.bpe import bpe_encode, bpe_train

    d = _t(spark, sf_dir, "documents")
    _, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode(d, "doc_id", "text", words=words)
    return enc.select(
        "doc_id",
        F.concat_ws(" ", "tokens").alias("tokens"),
        "n_tokens",
    )


_BPE_VOCAB_CTES = """
    , basec AS (SELECT DISTINCT unnest(s) AS sym FROM w0),
    mrg AS ({merges}),
    vocab AS (
      SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS INT) AS id,
             'base' AS kind FROM basec
      UNION ALL
      SELECT sym,
             CAST((SELECT count(*) FROM basec) + min(step) AS INT) AS id,
             'merge' AS kind
      FROM mrg GROUP BY sym)""".format(
    merges="\nUNION ALL\n".join(
        f"SELECT {i - 1} AS step, lhs || rhs AS sym FROM b{i}"
        for i in range(1, _BPE_N + 1)
    )
)


@query(
    "bpe_vocab_ids",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_VOCAB_CTES + "\n    SELECT id, sym, kind FROM vocab",
    ),
)
def bpe_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token-id VOCABULARY induced by BPE training — base symbols
    (observed characters + ``</w>``) at ids 0..B-1 in binary-lexicographic
    order, each learned merge at B+step, duplicates first-writer-wins —
    i.e. the vocab file a tokenizer ships.  B is bounded by the normalized
    charset (≤37), so the id assignment is a bounded driver-side step over
    an alphabet, never a corpus scan; the oracle replays the training CTE
    chain and re-derives the same ids in SQL."""
    from cassandra_util_spark.operators.bpe import bpe_train, bpe_vocab

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    return bpe_vocab(spark, words, merges)


@query(
    "bpe_encode_ids_corpus",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_VOCAB_CTES
        + f"""
    , {_BPE_SEGIDS_CTE},
    {_BPE_DW_CTE},
    enc AS (
      SELECT d.doc_id,
             string_agg(array_to_string(s.ids, ' '), ' ' ORDER BY d.pos)
               AS token_ids,
             CAST(sum(len(s.ids)) AS BIGINT) AS n_tokens
      FROM dw d JOIN segids s USING (word)
      GROUP BY d.doc_id)
    SELECT doc.doc_id,
           coalesce(e.token_ids, '') AS token_ids,
           CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents doc LEFT JOIN enc e USING (doc_id)
    """,
    ),
)
def bpe_encode_ids_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document TOKEN-ID stream under the learned vocabulary —
    what a training pipeline actually materializes for packing
    (`bpe_encode_corpus` is the readable-symbol twin).  The symbol→id
    mapping happens vocabulary-side (each trained word's segment array
    maps to an int array once, via a broadcast vocab join over |vocab|
    words), so the corpus-sized assembly shuffles ints, not symbol
    strings; the oracle re-derives the ids and streams in SQL from the
    same training replay.  Rendered as the space-joined id text for the
    cross-engine hash."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    )
    return enc.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
        "n_tokens",
    )


@query(
    "tokenized_packing_plan",
    oracle=_bpe_sql(
        _BPE_N,
        f"""
    , dwc AS (SELECT doc_id,
                unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                   x -> x <> '')) AS word
              FROM documents),
    tok AS (SELECT d.doc_id, CAST(sum(len(w.s)) AS BIGINT) AS n_tokens
            FROM dwc d JOIN w{_BPE_N} w USING (word)
            GROUP BY d.doc_id),
    c AS (SELECT doc_id, n_tokens,
            coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS cb
          FROM tok)
    SELECT doc_id, n_tokens, cb // 1024 AS bin, cb % 1024 AS bin_offset
    FROM c
    """,
    ),
)
def tokenized_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → pack, end to end under the LEARNED vocabulary: the
    1024-token training-window assignment computed from the true BPE
    token counts (`sequence_packing` is the same window arithmetic over
    the cheap regex estimate — this is the production form once a
    tokenizer exists).  Runs the distributed two-phase prefix sum
    (`pack_sequences(distributed=True)`) — one unbroken global token
    stream with NO single-task window stage — and the oracle replays
    both the tokenizer and the window arithmetic in SQL, so the
    composition is hash-certified through both halves."""
    from cassandra_util_spark.operators.bpe import bpe_token_profile, bpe_train
    from cassandra_util_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    _, words = bpe_train(d, "text", num_merges=_BPE_N)
    prof = bpe_token_profile(d, "doc_id", "text", words).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    return pack_sequences(
        prof, "doc_id", "n_tokens", capacity=1024, distributed=True
    )


# Shared oracle chain for the materialized-window family (r14: the
# dstream→cum→flat→post replay was about to be hand-duplicated into the
# attribution and manifest oracles — the same desync hazard the r13
# review fixed for dw/segids; one definition, interpolated everywhere).
# `post` is the global token stream: (doc_id, gpos, tok) with gpos the
# token's position in the doc_id-ordered concatenation.
_BPE_POST_CTES = (
    _BPE_VOCAB_CTES
    + f"""
    , {_BPE_SEGIDS_CTE},
    {_BPE_DW_CTE},
    dstream AS (
      SELECT d.doc_id, d.pos, s.ids
      FROM dw d JOIN segids s USING (word)),
    dtok AS (
      SELECT doc_id, CAST(sum(len(ids)) AS BIGINT) AS n
      FROM dstream GROUP BY doc_id),
    cum AS (
      SELECT doc_id,
             coalesce(CAST(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cb
      FROM dtok),
    flat AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos, k) - 1 AS i,
             tok
      FROM (SELECT doc_id, pos, k, ids[k] AS tok
            FROM dstream, UNNEST(range(1, len(ids) + 1)) u(k))),
    post AS (
      SELECT f.doc_id, c.cb + f.i AS gpos, f.tok
      FROM flat f JOIN cum c USING (doc_id))"""
)


# One oracle for BOTH window-materialization queries (one-shot and
# incremental): the shard-by-shard carry-forward materialization must
# equal the from-scratch windows — sharing the string IS the contract.
_WINDOWS_ORACLE = _bpe_sql(
    _BPE_N,
    _BPE_POST_CTES
    + """
    SELECT CAST(gpos // 1024 AS BIGINT) AS bin,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY gpos) AS token_ids
    FROM post GROUP BY 1
    """,
)


@query("packed_training_windows", oracle=_WINDOWS_ORACLE)
def packed_training_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED training windows, end to end: train the vocab,
    encode every document to its token-id stream, and emit the actual
    1024-token windows a trainer consumes — documents spilling across
    window boundaries, the final window partial
    (`tokenized_packing_plan` certifies the assignment arithmetic; this
    certifies the windows' contents).  The global running count runs
    through the distributed two-phase prefix sum (no single-task window)
    and reassembly is ONE (bin)-keyed shuffle of packed SLICE PIECES
    (~4 bytes/token — r14).  Window contents rendered as space-joined id
    text for the cross-engine hash."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams: distributed_cumsum executes its input
    # three times (boundaries, totals, local pass) — unpinned, each pass
    # replays encode's (id)-keyed assembly shuffle, which the r14 ramp
    # showed dominating the query's shuffle bytes (the incremental form,
    # which never re-executes encode, moved 320 MB at x30 vs 733 MB
    # here; see SCALING.md)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint()
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True
    )
    return win.select(
        "bin",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
    )


@query("bpe_streaming_encode", oracle=None)
def bpe_streaming_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tokenization end to end: the tokenizer model (word table
    + merges + id vocab) is trained once and FROZEN, the document corpus
    replays through a real file-source stream in three micro-batches
    (doc_id % 3), each batch's id streams append to a RunStore under the
    locked idempotent-ingest protocol (out-of-vocabulary words would
    segment via the frozen-merge replay; unseen symbols map to unk, never
    dropped), and the final LWW-merged view must hash-match ONE batch
    encode of the same corpus — `bpe_encode_ids_corpus`'s oracle, shared
    below.  Encoding is word-local under a frozen model, so the streamed
    store converges to the batch result regardless of batch boundaries —
    the property that lets a 100 TB corpus tokenize shard-by-shard
    without ever re-encoding history."""
    import tempfile

    from cassandra_util_spark.core.table import TableMeta
    from cassandra_util_spark.operators.bpe import bpe_train, bpe_vocab
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.corpus import stream_encode

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    vocab = bpe_vocab(spark, words, merges)
    src = _pinned_shard_src(
        [d.filter(F.col("doc_id") % 3 == k) for k in range(3)],
        ["doc_id", "text"],
        "bpe-stream",
    )
    store = RunStore(
        tempfile.mkdtemp(prefix="runstore-bpe-enc-"),
        TableMeta(("doc_id",), (), "writetime"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_encode(
            stream, store, tempfile.mkdtemp(prefix="bpe-enc-cp-"),
            words, vocab, merges=merges,
        )
        q.awaitTermination(300)
    view = store.read_merged(spark)
    return view.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
        "n_tokens",
    )


ORACLES["bpe_streaming_encode"] = ORACLES["bpe_encode_ids_corpus"]


@query(
    "bpe_roundtrip_text",
    oracle=f"SELECT doc_id, {_NORM_SQL} AS text FROM documents",
)
def bpe_roundtrip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's LOSSLESSNESS contract, cross-engine: Spark runs the
    whole loop — train the vocab, encode every document to token IDS,
    decode the id streams back through the id→symbol map — while the
    oracle computes the normalized text DIRECTLY; the value hash matches
    only if ``decode(encode(text)) == normalize_text(text)`` for every
    document, which is the property the entire id-stream representation
    (packing, windows, streaming stores) rests on.  BPE merges only
    concatenate, so decode is pure string surgery; the ``</w>`` terminal
    is the word boundary and cannot collide with normalized [a-z0-9]
    content."""
    from cassandra_util_spark.operators.bpe import (
        bpe_decode,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    vocab = bpe_vocab(spark, words, merges)
    ids = bpe_encode_ids(d, "doc_id", "text", words, vocab)
    return bpe_decode(ids, "doc_id", "token_ids", vocab=vocab)


@query(
    "semantic_decontamination",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    q AS (SELECT * FROM e WHERE vec_id % 25 = 0),
    t AS (SELECT * FROM e WHERE vec_id % 25 <> 0),
    scored AS (
      SELECT q.vec_id AS eval_id, t.vec_id AS best_train_id,
             round(CASE WHEN isnan(list_cosine_similarity(q.v, t.v)) THEN 0
                        ELSE list_cosine_similarity(q.v, t.v) END, 4)
               AS best_cosine
      FROM q CROSS JOIN t),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY eval_id
        ORDER BY best_cosine DESC, best_train_id ASC) AS rn
      FROM scored)
    SELECT eval_id, best_train_id, best_cosine,
           best_cosine >= 0.40 AS contaminated
    FROM r WHERE rn = 1
    """,
)
def semantic_decontamination_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEMANTIC half of train/eval decontamination: per evaluation
    vector (the held-out slice vec_id % 25 == 0), its best cosine match
    in the training slice and a flag when the rounded score clears 0.40
    (just under this corpus's natural max ~0.46 — both outcomes
    exercised).  The n-gram `decontamination` / `contamination_report`
    queries catch verbatim leakage; this catches paraphrased or
    re-rendered duplicates sharing no surface n-grams.  Eval side
    broadcasts (benchmark suites are small — the asymmetry is the
    design), the training corpus streams map-side, and the rank-1 filter
    is a map-side WindowGroupLimit prune, so shuffled rows are ∝ |eval|,
    never ∝ |train|; cosines round to 4 digits before ranking so the
    report and its tie-breaks replay bit-identically in SQL."""
    from cassandra_util_spark.operators.similarity import (
        semantic_decontamination,
    )

    e = _t(spark, sf_dir, "embeddings")
    return semantic_decontamination(
        e.filter(F.col("vec_id") % 25 != 0),
        e.filter(F.col("vec_id") % 25 == 0),
        "vec_id",
        "embedding",
        threshold=0.40,
    )


# --- Round-14 driver-window rotation (VERDICT r13 task 1: finish
# --- cumulative certification at 195/195) --------------------------------
#
# Rotate OUT: the entire round-13 window (all 50 rows green in
# CORRECTNESS_r13 — rows + schema + value-hash — and green in the
# committed 195/195 local oracle; the r13 verdict directs the full
# turnover so the 13 never-driver-checked round-13 additions plus the 37
# least-recently-certified rows fill the window).
#
# Rotate IN (50): the 13 round-13 additions (the BPE tokenizer family,
# the token-span excision family, materialized packed windows, semantic
# decontamination) followed by the 37 rows whose last driver
# certification is oldest (r8: 8 rows, r10: 24, r11: the first 5 of the
# once-certified cohort — computed from CORRECTNESS_r01..r13; ties broken
# by certification count then registration order).  Every rotate-in was
# re-verified against its local oracle at sf0.01 immediately before this
# commit (50/50 green, FAILURES: 0).  A green CORRECTNESS_r14 makes
# cumulative driver certification 195/195.
#
# Family coverage in the window is preserved: retention (rules delete +
# TTL + JSON-configured), tokenizer (train/encode/ids/stream/decode/
# round-trip), token spans (cross-doc, excised, incremental, streaming),
# packing (plan + materialized windows), decontamination (semantic),
# dedup (incremental, prefix-Jaccard, streaming LSH, NFC fingerprints,
# semantic-scaled), sketches (bottom-k, quantile, HLL-free CM advisory
# via join_plan_advisory/advised_join_exec), ANN (ivf, pq-adc),
# runstore/TWCS (skipindex, retention, streaming, z-order), TPC-H
# (q4/q7), events (cohorts, incremental rollup), retrieval (rrf, dsir),
# corpus pipeline (clean, gopher gate, ingest streaming, classifier),
# counters, range join, percentiles.

_WINDOW_ROTATE_IN_R14 = [
    # never driver-checked (round-13 additions, all local-oracle green)
    "bpe_learned_merges_batched",
    "dedup_token_spans_cross_doc",
    "token_spans_streaming_view",
    "dedup_token_spans_excised",
    "token_spans_incremental_excision",
    "bpe_encode_corpus",
    "bpe_vocab_ids",
    "bpe_encode_ids_corpus",
    "tokenized_packing_plan",
    "packed_training_windows",
    "bpe_streaming_encode",
    "bpe_roundtrip_text",
    "semantic_decontamination",
    # least-recently-certified re-certs (last certified r8)
    "retention_ttl",
    "ann_ivf_topk",
    "range_join_incidents",
    "retention_rules_delete",
    "configurable_delete_json",
    "token_range_filter",
    "q4_order_priority",
    "acctbal_percentiles",
    # last certified r10 (certification count 3, registration order)
    "semantic_dedup_scaled",
    "twcs_streaming_view",
    "dedup_streaming_lsh",
    "corpus_ingest_streaming",
    "dedup_ngram_prefix",
    "ann_pq_adc_topk",
    "bpe_learned_merges",
    "quality_classifier_scores",
    # last certified r10 (certification count 4)
    "advised_join_exec",
    "counter_store_totals",
    "zorder_layout_key",
    "runstore_skipindex_view",
    "twcs_retention_view",
    "q7_volume_shipping",
    "corpus_clean_pipeline",
    "gopher_quality_gate",
    "events_cohort_retention",
    # last certified r10 (certification count 5)
    "hybrid_retrieval_rrf",
    "dsir_select",
    "cluster_aware_split",
    "dedup_incremental",
    "events_incremental_rollup",
    "join_plan_advisory",
    "unicode_nfc_fingerprints",
    # last certified r11 (once-certified cohort, registration order)
    "bottomk_sample_docs",
    "bottomk_shard_merge",
    "quantile_sketch_doclen",
    "bottomk_streaming_sample",
    "quantile_sketch_by_lang",
]


def _rotate_driver_window_r14() -> None:
    names = list(QUERIES)
    rotate_out = names[:50]  # the full r13 window turns over (see above)
    missing = [n for n in _WINDOW_ROTATE_IN_R14 if n not in QUERIES]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    already = [n for n in _WINDOW_ROTATE_IN_R14 if n in rotate_out]
    if already:  # explicit raise — a bare assert vanishes under python -O
        raise AssertionError(f"rotate-in already inside the kept prefix: {already}")
    prefix = list(_WINDOW_ROTATE_IN_R14)
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_driver_window_r14()


# --- Round-14 additions (registered after the rotation: appended past the
# --- window, so the certified 50-name prefix is untouched) ----------------
#
# The window family gains its trainer-facing surface: per-window document
# attribution (the attention-mask / provenance map), and the deterministic
# shard manifest with portable content checksums (what a training loader
# actually mounts).  Both derive from already-certified chains — the
# attribution from the same slice pieces the reassembly ships, the
# manifest from the certified window contents + the corpus_shard_plan
# hash-shard discipline — and both replay end-to-end in SQL.


@query(
    "packed_window_attribution",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_POST_CTES
        + """
    , pb AS (SELECT doc_id, gpos, CAST(gpos // 1024 AS BIGINT) AS bin
             FROM post),
    sp AS (
      SELECT bin, doc_id,
             CAST(min(gpos) - bin * 1024 AS BIGINT) AS off,
             CAST(count(*) AS BIGINT) AS len
      FROM pb GROUP BY bin, doc_id)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(off AS VARCHAR) || ':' ||
                      CAST(len AS VARCHAR), ' ' ORDER BY off) AS spans
    FROM sp GROUP BY bin
    """,
    ),
)
def packed_window_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window DOCUMENT ATTRIBUTION for the materialized 1024-token
    training windows: which document owns tokens [off, off+len) of each
    window, ordered by in-window offset — exactly the map a trainer
    needs to build block-diagonal attention masks (no cross-document
    attention inside a packed window; the Llama/GPT-NeoX packing
    convention) and to trace any training token back to its source
    document.  The spans ARE the reassembly's slice pieces
    (`materialize_packed_windows(with_spans=True)`), so the map costs
    the windows' own shuffle and nothing more; a document contributes
    one span per window it touches, spans tile [0, capacity) disjointly,
    and the oracle re-derives every span as (min position, count) of the
    document's tokens inside the window.  Rendered doc:off:len for the
    cross-engine hash."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams: distributed_cumsum executes its input
    # three times, the shuffle-amplification hazard fixed in
    # packed_training_windows r14 (ADVICE r14: same pin everywhere)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint()
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True,
        with_spans=True,
    )
    return win.select(
        "bin",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.concat_ws(
            " ",
            F.transform(
                "doc_spans",
                lambda s: F.concat_ws(
                    ":",
                    s["doc"].cast("string"),
                    s["off"].cast("string"),
                    s["len"].cast("string"),
                ),
            ),
        ).alias("spans"),
    )


_WSHARD_SEED = "wshard"
_N_WSHARDS = 4

# One oracle for BOTH manifest queries (batch and incremental): the
# incremental counter-store totals must equal the from-scratch manifest —
# sharing the string IS the contract (the dedup_incremental discipline).
_WMANIFEST_ORACLE = _bpe_sql(
    _BPE_N,
    _BPE_POST_CTES
    + f"""
    , win AS (
      SELECT CAST(gpos // 1024 AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_tokens,
             string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY gpos) AS content
      FROM post GROUP BY 1)
    SELECT CAST({_h32_sql(f"'{_WSHARD_SEED}:' || CAST(bin AS VARCHAR)")}
                % {_N_WSHARDS} AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum({_h32_sql("content")}) AS BIGINT) AS checksum
    FROM win GROUP BY 1
    """,
)


@query("packed_shard_manifest", oracle=_WMANIFEST_ORACLE)
def packed_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-shard MANIFEST over the materialized windows: windows
    deal into shards by the portable hash of their bin (the
    `corpus_shard_plan` epoch-shuffle discipline lifted from documents to
    windows — shard membership is a pure function of (seed, bin), so
    re-runs, repartitions, and engine swaps mount identical shards), and
    each shard row carries the integrity triple a loader verifies before
    training: window count, token count, and an order-insensitive
    content checksum (the SUM of each window's portable md5 word — any
    dropped, duplicated, or corrupted window changes it, and an external
    engine reproduces it exactly).  One extra aggregate over the
    certified window contents; at 100 TB the manifest is |shards| rows
    and the checksum folds map-side."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        shard_manifest,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams: distributed_cumsum executes its input
    # three times, the shuffle-amplification hazard fixed in
    # packed_training_windows r14 (ADVICE r14: same pin everywhere)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint()
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True
    )
    return shard_manifest(win, num_shards=_N_WSHARDS, seed=_WSHARD_SEED)


_CUR_SEED = "cur0"
_CUR_SHARDS = 4
_CUR_QUALITY_SQL = f"""round(0.4 * least(len({_TOKS_SQL}) / 100.0, 1.0)
               + 0.3 * least((len(list_filter(list_transform({_TOKS_SQL}, x -> lower(x)),
                                              x -> list_contains({_STOPS_SQL}, x)))
                              / greatest(len({_TOKS_SQL}), 1)) * 4.0, 1.0)
               + 0.3 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                     / greatest(length(text), 1)) * 5.0, 1.0)), 6)"""


@query(
    "curriculum_stage_schedule",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             {_CUR_QUALITY_SQL} AS quality,
             {_h32_sql(f"'{_CUR_SEED}:' || CAST(doc_id AS VARCHAR)")} AS gate,
             {_h32_sql(f"'{_CUR_SEED}:' || CAST(doc_id AS VARCHAR)", offset=9)} AS ord
      FROM documents),
    s AS (
      SELECT doc_id, quality,
             CASE WHEN quality >= 0.7 THEN 0
                  WHEN quality >= 0.6 THEN 1
                  WHEN quality >= 0.5 THEN 2
                  ELSE 3 END AS stage,
             CAST(gate % {_CUR_SHARDS} AS INT) AS shard,
             ord
      FROM q)
    SELECT doc_id, quality, CAST(stage AS INT) AS stage, shard,
           CAST(row_number() OVER (
             PARTITION BY stage, shard
             ORDER BY ord ASC, doc_id ASC) AS BIGINT) AS pos
    FROM s
    """,
)
def curriculum_stage_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: every document assigned a quality STAGE
    (cleanest first — the easy→hard schedule curriculum training
    consumes; fixed score thresholds inlined into both engines, never
    engine-specific quantiles), a deterministic SHARD within its stage,
    and a reproducible within-(stage, shard) position from an
    independent hash word — the `corpus_shard_plan` epoch-shuffle
    discipline nested under a curriculum stage.  The loader reads stages
    in ascending order, shards in parallel; stage/shard are map-only
    expressions that fold into the scan, and the only exchange is the
    (stage, shard) hash partition + per-group sort — no global range
    sort at any scale (raise the shard count to raise sort parallelism;
    membership stays a pure function of (seed, doc_id))."""
    from pyspark.sql import Window

    from cassandra_util_spark.functions import portable_hash32
    from cassandra_util_spark.operators.text import quality_score

    d = _t(spark, sf_dir, "documents")
    key = F.concat(F.lit(f"{_CUR_SEED}:"), F.col("doc_id").cast("string"))
    # STAGE the quality score (SCALING.md r14 staging note): the stage
    # when-chain reads it four more times, and the score's token arrays
    # are higher-order lambdas — unstaged, five re-tokenizations per row
    q = F.col("quality")
    stage = (
        F.when(q >= 0.7, 0)
        .when(q >= 0.6, 1)
        .when(q >= 0.5, 2)
        .otherwise(3)
        .cast("int")
    )
    staged = d.withColumn("quality", quality_score(F.col("text"))).select(
        "doc_id",
        "quality",
        stage.alias("stage"),
        F.pmod(portable_hash32(key), F.lit(_CUR_SHARDS)).cast("int").alias("shard"),
        portable_hash32(key, offset=9).alias("__ord"),
    )
    w = Window.partitionBy("stage", "shard").orderBy(
        F.col("__ord").asc(), F.col("doc_id").asc()
    )
    return staged.withColumn(
        "pos", F.row_number().over(w).cast("bigint")
    ).drop("__ord")


_FIM_SEED = "fim0"
_FIM_RATE = 0.7
_FIM_MIN = 16


@query(
    "fim_token_streams",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_VOCAB_CTES
        + f"""
    , {_BPE_SEGIDS_CTE},
    {_BPE_DW_CTE},
    enc AS (
      SELECT d.doc_id, flatten(list(s.ids ORDER BY d.pos)) AS ids
      FROM dw d JOIN segids s USING (word) GROUP BY d.doc_id),
    base AS (
      SELECT doc.doc_id, coalesce(e.ids, []) AS ids,
             CAST(len(coalesce(e.ids, [])) AS BIGINT) AS n
      FROM documents doc LEFT JOIN enc e USING (doc_id)),
    dealt AS (
      SELECT doc_id, ids, n,
             ({_h32_sql(f"'{_FIM_SEED}:' || CAST(doc_id AS VARCHAR)")}
                < {int(round(_FIM_RATE * 2**32))} AND n >= {_FIM_MIN}) AS fim,
             {_h32_sql(f"'{_FIM_SEED}:' || CAST(doc_id AS VARCHAR)", offset=9)}
               % greatest(n, 1) AS h1,
             {_h32_sql(f"'{_FIM_SEED}:' || CAST(doc_id AS VARCHAR)", offset=17)}
               % greatest(n, 1) AS h2
      FROM base),
    arranged AS (
      SELECT doc_id, fim,
             CASE WHEN fim THEN
               [-101] || ids[1:least(h1, h2)]
               || [-102] || ids[greatest(h1, h2) + 1:n]
               || [-103] || ids[least(h1, h2) + 1:greatest(h1, h2)]
             ELSE ids END AS out
      FROM dealt)
    SELECT doc_id, fim,
           array_to_string(out, ' ') AS token_ids,
           CAST(len(out) AS BIGINT) AS n_tokens
    FROM arranged
    """,
    ),
)
def fim_token_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-middle training streams under the learned vocabulary
    (Bavarian et al. 2022): a deterministic 70% of documents have a
    hash-chosen span moved behind [PRE]/[SUF]/[MID] sentinels (PSM
    order) so an autoregressive model learns infilling; the rest — and
    every document under 16 tokens — pass through untouched, the
    standard joint-objective mix.  The deal and both span endpoints are
    independent portable md5 words of (seed, doc_id), so there is no
    RNG state to checkpoint and the oracle replays the whole transform
    (including degenerate empty-middle spans) exactly; the transform
    itself is one map-only expression pass over the encoded streams —
    three array slices and a concat, no shuffle, no UDF."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import fim_transform

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    )
    out = fim_transform(
        enc, "doc_id", "token_ids",
        rate=_FIM_RATE, min_tokens=_FIM_MIN, seed=_FIM_SEED,
    )
    return out.select(
        "doc_id",
        "fim",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
        "n_tokens",
    )


@query("manifest_incremental_totals", oracle=_WMANIFEST_ORACLE)
def manifest_incremental_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard manifest maintained INCREMENTALLY, hash-certified against
    the from-scratch oracle it shares with `packed_shard_manifest`: the
    materialized windows arrive in three batches (bin mod 3), each
    batch's manifest — every column a SUM, so the manifest of a union is
    the column-wise sum of manifests — appends to a
    :class:`~cassandra_util_spark.operators.counters.CounterStore` as an
    additive delta run (no writer ever reads a total), with a compaction
    FOLD interleaved after the second append; the totals view must equal
    the one-shot manifest.  This is the 100 TB property the manifest
    exists for: as shards ingest, integrity accounting ships deltas and
    never recomputes the corpus view — and addition's associativity (the
    counter store's whole correctness argument) is exactly what makes
    the checksum fold-invariant."""
    import tempfile

    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.counters import CounterStore
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        shard_manifest,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    )
    # pin the windows once: three batch filters must not re-run the
    # train+encode chain (the bounded-materialization discipline).
    # LAZY (r18): the first append's write is a single sequential
    # full-scan consumer — it materializes the pin inside its own job;
    # the later batch filters read the pinned blocks, so the eager
    # pin's separate pass over the window chain is gone
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True
    ).localCheckpoint(eager=False)
    cs = CounterStore(
        tempfile.mkdtemp(prefix="manifest-inc-"),
        ["shard"],
        ["n_windows", "n_tokens", "checksum"],
    )
    for i in range(3):
        batch = win.filter(F.col("bin") % 3 == i)
        cs.append_increments(
            shard_manifest(batch, num_shards=_N_WSHARDS, seed=_WSHARD_SEED)
        )
        if i == 1:
            cs.compact(spark)
    totals = cs.totals(spark)
    return totals.select(
        "shard",
        *[F.col(c).cast("bigint").alias(c)
          for c in ("n_windows", "n_tokens", "checksum")],
    )


_T5_SEED = "t50"
_T5_WORD = lambda off: _h32_sql(  # noqa: E731
    f"'{_T5_SEED}:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)",
    offset=off,
)


@query(
    "span_corruption_pairs",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_VOCAB_CTES
        + f"""
    , {_BPE_SEGIDS_CTE},
    {_BPE_DW_CTE},
    enc AS (
      SELECT d.doc_id, flatten(list(s.ids ORDER BY d.pos)) AS ids
      FROM dw d JOIN segids s USING (word) GROUP BY d.doc_id),
    base AS (
      SELECT doc.doc_id, coalesce(e.ids, []) AS ids,
             CAST(len(coalesce(e.ids, [])) AS BIGINT) AS n
      FROM documents doc LEFT JOIN enc e USING (doc_id)),
    par AS (
      SELECT doc_id, ids, n,
             greatest(CAST(floor(n * 0.15 / 3 + 0.5) AS INT), 1) AS k
      FROM base WHERE n >= 16),
    segd AS (SELECT *, CAST(n // k AS INT) AS seg FROM par),
    sp AS (
      SELECT doc_id, ids, n, seg, CAST(j AS INT) AS j,
             least(1 + CAST({_T5_WORD(9)} % 5 AS INT), seg) AS ln
      FROM segd, UNNEST(range(k)) u(j)),
    sp2 AS (
      SELECT *, j * seg + CAST({_T5_WORD(17)} % (seg - ln + 1) AS INT) AS start
      FROM sp),
    sp3 AS (
      SELECT doc_id, ids, j, start, ln,
             coalesce(CAST(lag(start + ln) OVER (
               PARTITION BY doc_id ORDER BY j) AS INT), 0) AS prev
      FROM sp2),
    pieces AS (
      SELECT doc_id,
             flatten(list(ids[prev + 1:start] || [-201 - j] ORDER BY j))
               AS inp_head,
             flatten(list([-201 - j] || ids[start + 1:start + ln] ORDER BY j))
               AS tgt,
             CAST(max(start + ln) AS INT) AS last_end
      FROM sp3 GROUP BY doc_id)
    SELECT b.doc_id,
           b.n >= 16 AS corrupted,
           array_to_string(
             CASE WHEN b.n >= 16
                  THEN p.inp_head || b.ids[p.last_end + 1:CAST(b.n AS INT)]
                  ELSE b.ids END, ' ') AS inputs,
           CASE WHEN b.n >= 16 THEN array_to_string(p.tgt, ' ') ELSE '' END
             AS targets
    FROM base b LEFT JOIN pieces p USING (doc_id)
    """,
    ),
)
def span_corruption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption denoising pairs over the learned
    vocabulary (Raffel et al. 2020): per eligible document,
    ``k ≈ n·0.15/3`` hash-placed spans leave per-span sentinels in
    ``inputs`` and concatenate sentinel-delimited into ``targets`` —
    the (inputs, targets) pair an encoder-decoder or prefix-LM
    objective consumes, with exact reconstruction as the pinned
    invariant.  Span placement is segment-stratified (one span per
    equal segment, offset and length from independent portable md5
    words of (seed, doc_id, span-index)) — non-overlapping BY
    CONSTRUCTION, no rejection loop, no RNG state, bit-identical across
    engines; short documents pass through.  The transform itself is
    map-only array expressions (no shuffle, no UDF); the oracle replays
    every draw, the lag-stitched inputs, and the target stream in SQL."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import span_corruption

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    )
    out = span_corruption(
        enc, "doc_id", "token_ids",
        noise_density=0.15, mean_span=3, min_tokens=16, seed=_T5_SEED,
    )
    joined = F.concat_ws  # noqa: E731 — alias for line width
    return out.select(
        "doc_id",
        "corrupted",
        joined(" ", F.transform("inputs", lambda x: x.cast("string"))).alias(
            "inputs"
        ),
        joined(" ", F.transform("targets", lambda x: x.cast("string"))).alias(
            "targets"
        ),
    )


@query(
    "windowed_loss_masks",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_POST_CTES
        + f"""
    , pb AS (SELECT doc_id, gpos, CAST(gpos // 1024 AS BIGINT) AS bin
             FROM post),
    sp AS (
      SELECT bin, doc_id,
             CAST(min(gpos) - bin * 1024 AS BIGINT) AS off,
             CAST(count(*) AS BIGINT) AS len
      FROM pb GROUP BY bin, doc_id),
    keepfl AS (
      SELECT doc_id, {_CUR_QUALITY_SQL} >= 0.5 AS keep FROM documents)
    SELECT bin,
           CAST(sum(len) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN 0 ELSE len END) AS BIGINT)
             AS masked_tokens,
           string_agg(repeat(CASE WHEN keep THEN '1' ELSE '0' END,
                             CAST(len AS INT)), '' ORDER BY off) AS mask
    FROM sp JOIN keepfl USING (doc_id) GROUP BY bin
    """,
    ),
)
def windowed_loss_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token loss masks over the materialized 1024-token windows: a
    document-level verdict (here the [0,1] quality score thresholded at
    0.5 — the `curriculum_stage_schedule` signal, single-sourced) turns
    into a per-window bitstring where failing documents' tokens stop
    contributing loss — the SOFT removal a pipeline wants when verdicts
    change AFTER windows are materialized: stream, window boundaries,
    and shard manifests all stay byte-identical, no repacking.  Derived
    entirely from the attribution spans: one explode ∝ spans (two
    orders below tokens), one (doc)-keyed join, one (bin)-keyed
    regroup — token content never ships.  The oracle re-derives every
    span and the keep verdicts and rebuilds each bitstring in SQL."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        loss_mask_windows,
        materialize_packed_windows,
    )
    from cassandra_util_spark.operators.text import quality_score

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams: distributed_cumsum executes its input
    # three times, the shuffle-amplification hazard fixed in
    # packed_training_windows r14 (ADVICE r14: same pin everywhere)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint()
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True,
        with_spans=True,
    )
    keep = d.select(
        F.col("doc_id").alias("doc"),
        (quality_score(F.col("text")) >= 0.5).alias("keep"),
    )
    return loss_mask_windows(win, keep, doc_col="doc")


@query(
    "window_leak_audit",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_POST_CTES
        + f"""
    , pb AS (SELECT doc_id, gpos, CAST(gpos // 1024 AS BIGINT) AS bin
             FROM post),
    sp AS (
      SELECT bin, doc_id, CAST(count(*) AS BIGINT) AS len
      FROM pb GROUP BY bin, doc_id),
    held AS (
      SELECT doc_id FROM documents WHERE {_SPLIT_GATE} >= {_SPLIT_T1})
    SELECT bin,
           CAST(count(*) AS BIGINT) AS leaked_docs,
           CAST(sum(len) AS BIGINT) AS leaked_tokens
    FROM sp JOIN held USING (doc_id)
    GROUP BY bin
    """,
    ),
)
def window_leak_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-level train/eval LEAK AUDIT — the check that closes the
    split → pack loop: after packing, which training windows contain
    tokens owned by held-out (val/test) documents, and how many.  The
    n-gram and semantic decontamination queries judge CONTENT overlap;
    this judges MEMBERSHIP — a pipeline that packed the full corpus
    instead of the train split (the classic silent leak) lights up
    here window by window, and the `windowed_loss_masks` mechanism is
    the cheapest remediation (mask the leaked spans, keep the stream).
    Built from the attribution spans ⨝ the `corpus_split_assignment`
    hash gate (both already certified): explode ∝ spans, one
    (doc)-keyed join against the held-out set, one (bin)-keyed rollup —
    token content never ships, and the audit is reproducible in SQL
    down to the gate literals."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )
    from cassandra_util_spark.operators.sampling import corpus_splits

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams: distributed_cumsum executes its input
    # three times, the shuffle-amplification hazard fixed in
    # packed_training_windows r14 (ADVICE r14: same pin everywhere)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint()
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True,
        with_spans=True,
    )
    held = corpus_splits(
        d.select("doc_id"), "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
    ).filter(F.col("split") != "train").select(F.col("doc_id").alias("doc"))
    sp = win.select("bin", F.explode("doc_spans").alias("s")).select(
        "bin", F.col("s.doc").alias("doc"), F.col("s.len").alias("len")
    )
    return (
        sp.join(held, "doc")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("leaked_docs"),
            F.sum("len").cast("bigint").alias("leaked_tokens"),
        )
    )


@query("windows_incremental_store", oracle=_WINDOWS_ORACLE)
def windows_incremental_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized training windows built INCREMENTALLY, shard by
    shard, hash-certified against the SAME oracle as the one-shot
    `packed_training_windows` (the shared-oracle discipline): the corpus
    arrives as three ascending doc-id ranges (append order), each shard
    materializes its windows with the boundary partial window carried
    forward as doc-attributed pieces, and the union must equal the
    from-scratch materialization bin for bin.  This is the
    100 TB maintenance property the window family needed: as the corpus
    ingests, already-emitted full windows are IMMUTABLE — history never
    re-packs — and the only cross-shard state is ≤ capacity tokens (the
    O(1) carry), not the stream."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_windows_incremental,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams once: the three shard filters must not
    # re-run the train+encode chain (the bounded-materialization
    # discipline).  LAZY (r18): the max-id aggregate right below scans
    # every partition and materializes the pin inside its own job —
    # one fewer full execution of the train+encode chain; the shard
    # steps then read the pinned blocks
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint(eager=False)
    mx = enc.agg(F.max("doc_id").alias("m")).first()["m"]
    c1, c2 = mx // 3, (2 * mx) // 3
    shards = [
        enc.filter(F.col("doc_id") <= c1),
        enc.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        enc.filter(F.col("doc_id") > c2),
    ]
    win = materialize_windows_incremental(
        shards, "doc_id", "token_ids", capacity=1024
    )
    return win.select(
        "bin",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
    )


@query(
    "sharded_training_windows",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_VOCAB_CTES
        + f"""
    , {_BPE_SEGIDS_CTE},
    {_BPE_DW_CTE},
    dstream AS (
      SELECT d.doc_id, doc.lang, d.pos, s.ids
      FROM dw d JOIN segids s USING (word)
      JOIN documents doc USING (doc_id)),
    dtok AS (
      SELECT doc_id, any_value(lang) AS lang,
             CAST(sum(len(ids)) AS BIGINT) AS n
      FROM dstream GROUP BY doc_id),
    cum AS (
      SELECT doc_id, lang,
             coalesce(CAST(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cb
      FROM dtok),
    flat AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos, k) - 1 AS i,
             tok
      FROM (SELECT doc_id, pos, k, ids[k] AS tok
            FROM dstream, UNNEST(range(1, len(ids) + 1)) u(k))),
    post AS (
      SELECT f.doc_id, c.lang, c.cb + f.i AS gpos, f.tok
      FROM flat f JOIN cum c USING (doc_id))
    SELECT lang, CAST(gpos // 1024 AS BIGINT) AS bin,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY gpos) AS token_ids
    FROM post GROUP BY 1, 2
    """,
    ),
)
def sharded_training_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION window-materialization path, certified: windows
    restart per shard (here the language column — petabyte pipelines
    shard by a stable key exactly so no cross-shard coordination
    exists), the running count is a per-shard parallel window (never a
    global stream, no prefix-sum machinery needed), and window ids are
    (shard, bin).  `packed_training_windows` certifies the global
    single-stream form; this row certifies the form a 1000-executor
    deployment actually runs — fully parallel across shards, one
    (shard, bin)-keyed slice-piece shuffle — against a per-shard SQL
    replay of the same arithmetic."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).join(d.select("doc_id", "lang"), "doc_id")
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, shard_col="lang"
    )
    return win.select(
        "lang",
        "bin",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
    )


@query(
    "dataset_datasheet",
    oracle=f"""
    WITH q AS (
      SELECT source, lang, doc_id,
             {_REGEX_TOKS_SQL} AS toks,
             CAST(round({_CUR_QUALITY_SQL} * 1000000) AS BIGINT) AS q6,
             md5({_NORM_SQL}) AS fp
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           round(sum(q6) / CAST(count(*) AS DOUBLE) / 1000000, 6)
             AS mean_quality,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           round(count(*) FILTER (lang = 'en') / CAST(count(*) AS DOUBLE), 6)
             AS en_share,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_docs
    FROM q GROUP BY source
    """,
)
def dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source DATASET DATASHEET — the release card a corpus ships
    with (Gebru et al. 2021's datasheet shape, the numeric rows): per
    source, document and token counts, mean quality score, language
    spread and English share, and the exact-duplicate count (normalized
    md5 fingerprints).  Every signal is an already-certified operator
    (regex token estimator, quality score, fingerprint) rolled into one
    partial-aggregated pass — |sources| output rows from one scan, no
    joins; the mean quality sums exact 1e-6-scaled INTEGERS so a
    1000-executor sum is order-independent and replays bit-identically
    in SQL (the decimal-counter discipline applied to floats)."""
    from cassandra_util_spark.operators.text import (
        fingerprint,
        quality_score,
        regex_token_count,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    q6 = F.round(quality_score(t) * 1000000).cast("bigint")
    staged = d.select(
        "source", "lang",
        regex_token_count(t).alias("toks"),
        q6.alias("q6"),
        fingerprint(t).alias("fp"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("q6") / F.count(F.lit(1)).cast("double") / 1000000, 6
        ).alias("mean_quality"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.round(
            F.count(F.when(F.col("lang") == "en", 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("en_share"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).cast("bigint").alias(
            "dup_docs"
        ),
    )


# --------------------------------------------------------------------------
# Driver-window rotation, round 15 (VERDICT r14, task 1).
#
# Rotate IN (50): the 11 round-14 additions (the trainer-facing window
# surface — attribution, masks, shard manifests, FIM, span corruption,
# curriculum, incremental/sharded windows, leak audit, datasheet)
# followed by the 39 rows whose last driver certification is oldest
# (all last certified r11 — 19 once-certified rows in registration
# order, then 20 thrice-certified rows: the IVF-PQ family, Jaccard
# routing, BPE profile, classifier eval, and TPC-H q8/q11-q21 —
# computed from CORRECTNESS_r01..r14; ties broken by certification
# count then registration order).  Every rotate-in was re-verified
# against its local oracle at sf0.01 immediately before this commit
# (50/50 green, FAILURES: 0).  A green CORRECTNESS_r15 completes
# cumulative driver certification at 206/206.
#
# Family coverage in the window is preserved: packing/windows (the 11
# trainer rows), sampling (weighted, bottom-k family rotated out green
# in r14), sketches (HLL registers/per-type, count-min, adaptive
# length bounds), ANN (IVF-PQ topk/filtered/persisted/streaming, RP
# projection + rerank, PQ rerank), runstore (compaction, z-order 2D),
# dedup (edit distance, Jaccard routed + advisory), corpus pipeline
# (gate report, shard plan, lang profile, split assignment, token
# budget, zipf audit), tokenizer (token profile), quality (classifier
# eval), TPC-H (q2, q8, q11-q21).

def _rotate_driver_window(rotate_in: list) -> None:
    """Reorder QUERIES/ORACLES so ``rotate_in`` becomes the certified
    first-50 driver-window prefix — the ONE copy of the rotation
    mechanism (review r17: r15/r16/r17 each carried a verbatim clone
    differing only in which list they read; a rotation-logic fix needed
    N edits).  The per-round ``_WINDOW_ROTATE_IN_R*`` lists — the
    auditable part — stay separate."""
    names = list(QUERIES)
    rotate_out = names[:50]  # the full prior window turns over
    missing = [n for n in rotate_in if n not in QUERIES]
    if missing:
        raise AssertionError(f"window rotation references unknown queries: {missing}")
    already = [n for n in rotate_in if n in rotate_out]
    if already:  # explicit raise — a bare assert vanishes under python -O
        raise AssertionError(f"rotate-in already inside the kept prefix: {already}")
    prefix = list(rotate_in)
    if len(prefix) != 50:
        raise AssertionError(
            f"window rotation must produce exactly 50 names, got {len(prefix)}"
        )
    order = prefix + [n for n in names if n not in set(prefix)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in order if n in snapshot})


_WINDOW_ROTATE_IN_R15 = [
    # never driver-checked (round-14 additions, all local-oracle green)
    "packed_window_attribution",
    "packed_shard_manifest",
    "curriculum_stage_schedule",
    "fim_token_streams",
    "manifest_incremental_totals",
    "span_corruption_pairs",
    "windowed_loss_masks",
    "window_leak_audit",
    "windows_incremental_store",
    "sharded_training_windows",
    "dataset_datasheet",
    # least-recently-certified re-certs (last certified r11, count 1)
    "weighted_sample_docs",
    "adaptive_length_bounds_sketch",
    "ann_ivfpq_filtered",
    "sketch_hll_registers",
    "sketch_hll_per_type",
    "sketch_count_min_users",
    "ivf_persisted_probe",
    "runstore_compaction_view",
    "runstore_zorder_2d",
    "embedding_rp_project",
    "ann_rp_rerank",
    "q2_min_cost_supplier",
    "dedup_edit_distance",
    "corpus_gate_report",
    "corpus_shard_plan",
    "corpus_lang_profile",
    "corpus_split_assignment",
    "corpus_token_budget",
    "corpus_zipf_audit",
    # last certified r11, count 3 (registration order)
    "ann_ivfpq_topk",
    "ivfpq_persisted_probe",
    "ivfpq_streaming_index",
    "dedup_jaccard_routed",
    "jaccard_route_advisory",
    "bpe_token_profile",
    "ann_pq_rerank_topk",
    "quality_classifier_eval",
    "q8_market_share",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_relation",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
]


_rotate_driver_window(_WINDOW_ROTATE_IN_R15)  # the full r14 window turns over (all green in r14)


# --- Round-15 additions (registered after the rotation: appended past the
# --- window, so the certified 50-name prefix is untouched) ----------------


def _pinned_shard_src(shard_frames, cols, prefix: str) -> str:
    """Write frames as ``shard-00``, ``shard-01``… parquet dirs with
    ASCENDING pinned mtimes and return the parent dir — the ONE copy of
    the file-source append-order pin (the carry protocol's and the
    batch-labeled drift monitor's precondition: micro-batch k must
    deliver shard k).  Shared by `_drain_windows_store` and
    `tokenizer_coverage_drift`.

    All shards land in ONE tagged write (r17): the per-shard
    ``coalesce(1).write`` loop paid one driver-blocking job per shard,
    each re-reading the shared upstream.  ``repartition(n, __shard)``
    keeps every shard's rows in exactly one task, so each partition dir
    holds exactly one part file — the 1-file-per-trigger contract the
    drain's ``maxFilesPerTrigger=1`` ordering rests on.  An EMPTY shard
    writes no partition dir, but must still deliver its (empty)
    micro-batch — batch ids feed the stores' writetime column — so
    missing dirs are backfilled with a zero-row parquet write before the
    mtime pinning."""
    import os
    import tempfile
    import time

    if not shard_frames:
        # shard_frames[0] supplies the session and the backfill schema —
        # an empty list would IndexError two lines down with no hint
        # (ADVICE r17); no shards is a caller bug, not an empty source
        raise ValueError("_pinned_shard_src: need at least one shard frame")
    spark = shard_frames[0].sparkSession
    mrpf = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    if mrpf not in ("0", None):
        # the 1-file-per-shard-dir contract (batch k = shard k under
        # maxFilesPerTrigger=1) silently breaks if the writer splits a
        # shard across part files (ADVICE r17)
        raise RuntimeError(
            "_pinned_shard_src: spark.sql.files.maxRecordsPerFile="
            f"{mrpf} would split shards across part files and break the "
            "one-file-per-trigger batch ordering; unset it"
        )
    src = tempfile.mkdtemp(prefix=f"{prefix}-src-")
    tagged = None
    for k, sh in enumerate(shard_frames):
        t = sh.select(*cols).withColumn("__shard", F.lit(k))
        tagged = t if tagged is None else tagged.unionByName(t)
    staging = os.path.join(src, "_stage")
    (
        tagged.repartition(len(shard_frames), "__shard")
        .write.partitionBy("__shard")
        .parquet(staging)
    )
    schema = shard_frames[0].select(*cols).schema
    now = time.time()
    for k in range(len(shard_frames)):
        sub = os.path.join(src, f"shard-{k:02d}")
        part = os.path.join(staging, f"__shard={k}")
        if os.path.isdir(part):
            os.rename(part, sub)
        else:  # empty shard: no partition dir was written — backfill
            spark.createDataFrame([], schema).coalesce(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (now + k, now + k))
    return src


def _drain_encode_store(spark, src, kept, vocab, prefix, oov="bytes"):
    """Drive a (doc_id, text) file-source stream through `stream_encode`
    into a fresh (doc_id,)-keyed RunStore and return it — the ONE copy
    of the encode-drain scaffold (review r17: `tokenizer_streaming_
    encode` and `tokenizer_coverage_drift` each hand-rolled it; the
    windows drain was deduplicated for the same reason in r16).  Raises
    on drain timeout — a partial store surfaces later as an opaque
    hash mismatch."""
    import os
    import tempfile

    from cassandra_util_spark.core.table import TableMeta
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.corpus import stream_encode

    store = RunStore(
        tempfile.mkdtemp(prefix=f"{prefix}-store-"),
        TableMeta(("doc_id",), (), "writetime"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*") if os.path.isdir(
            os.path.join(src, "shard-00")) else src)
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_encode(
            stream, store, tempfile.mkdtemp(prefix=f"{prefix}-cp-"),
            kept, vocab, oov=oov,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"{prefix}: encode drain did not finish within 300s — "
                "refusing to read a partial store"
            )
    return store


def _drain_windows_store(spark, shard_frames, id_col, capacity, prefix):
    """Drive ascending micro-batches of ``(id, token_ids)`` frames through
    `stream_windows` into a fresh window RunStore and return it — the ONE
    copy of the streaming-store scaffold shared by
    `windows_streaming_store`, `epoch_plan_from_store`, and
    `curriculum_windows_from_store` (review r16: the carry protocol's
    append-order precondition lives entirely in the pinned ascending file
    mtimes; three hand-maintained copies could silently drift).  A drain
    that exceeds the timeout RAISES instead of returning — reading a
    partially-populated store would surface much later as an opaque
    value-hash mismatch (review r16)."""
    import os
    import tempfile

    from cassandra_util_spark.core.table import TableMeta
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.corpus import stream_windows

    dtypes = dict(shard_frames[0].dtypes)
    src = _pinned_shard_src(shard_frames, [id_col, "token_ids"], prefix)
    store = RunStore(
        tempfile.mkdtemp(prefix=f"{prefix}-store-"),
        TableMeta(("bin",), (), "writetime"),
    )
    stream = (
        spark.readStream.schema(
            f"{id_col} {dtypes[id_col]}, token_ids {dtypes['token_ids']}"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    with _scoped_shuffle_partitions(spark, 8):
        q = stream_windows(
            stream, store, tempfile.mkdtemp(prefix=f"{prefix}-cp-"),
            capacity=capacity, id_col=id_col,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"{prefix}: window-store drain did not finish within 300s "
                "— refusing to read a partially-populated store"
            )
    return store


def _ascending_id_shards(enc, id_col: str = "doc_id", n: int = 3,
                         mx=None) -> list:
    """Split an encoded frame into ``n`` ascending id-range shards — the
    ONE copy of the micro-batch range split feeding
    `_drain_windows_store` (review r17: `_corpus_window_store` and
    `windows_store_decode_roundtrip` each hand-rolled it).  Ranges are
    computed from the max id (one 1-row aggregate), so shard k+1's ids
    all exceed shard k's — the carry protocol's append-order
    precondition.  Pass ``mx`` when the caller already aggregated the
    max id (one job saved per run)."""
    if mx is None:
        mx = enc.agg(F.max(id_col).alias("m")).first()["m"]
    cuts = [None] + [(k * mx) // n for k in range(1, n)] + [None]
    shards = []
    for lo, hi in zip(cuts, cuts[1:]):
        c = F.lit(True)
        if lo is not None:
            c = c & (F.col(id_col) > lo)
        if hi is not None:
            c = c & (F.col(id_col) <= hi)
        shards.append(enc.filter(c))
    return shards


def _corpus_window_store(spark, sf_dir: str):
    """train → encode → three ascending doc-id micro-batches → persisted
    1024-token window store: the shared fixture build of
    `windows_streaming_store` and `epoch_plan_from_store`."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams once: the three shard writes must not
    # re-run the train+encode chain (the bounded-materialization
    # discipline).  LAZY (r18): `_ascending_id_shards`'s max-id
    # aggregate is the first consumer and scans every partition — it
    # materializes the pin in its own job, and the one tagged shard
    # write then reads the pinned blocks (its three union branches see
    # an already-materialized checkpoint, so no duplicate compute)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint(eager=False)
    return _drain_windows_store(
        spark, _ascending_id_shards(enc), "doc_id", capacity=1024,
        prefix="win-stream",
    )


def _windows_store_view(spark, store) -> DataFrame:
    """The store's LWW-merged window view rendered for the cross-engine
    hash (token ids as the space-joined string)."""
    view = store.read_merged(spark)
    return view.select(
        "bin",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
    )


@query("windows_streaming_store", oracle=_WINDOWS_ORACLE)
def windows_streaming_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized training windows built by a STRUCTURED STREAM,
    hash-certified against the SAME oracle as the one-shot
    `packed_training_windows` and the batch-incremental
    `windows_incremental_store` (the shared-oracle discipline — VERDICT
    r14 task 2, closing the last batch/streaming family asymmetry): the
    encoded corpus replays through a real file-source stream in three
    ascending doc-id range micro-batches (append order, pinned file
    mtimes), each batch materializes its windows under the carry-forward
    protocol with the boundary partial window reconstructed FROM THE
    STORE (never driver memory — restart-safe by construction) and
    appends them as an idempotent named run, and the store's LWW-merged
    view must equal the from-scratch windows bin for bin.  This is how
    a 100 TB corpus windows as the crawl lands: already-emitted full
    windows are immutable, per-batch cost ∝ the batch, and the only
    cross-batch state is ≤ capacity tokens read back from the store's
    max-bin row."""
    return _windows_store_view(spark, _corpus_window_store(spark, sf_dir))

_EPOCH_SEED = "ep0"
_N_EPOCHS = 3
_EPOCH_SHARDS = 4

_WEPOCH_ORACLE = _bpe_sql(
    _BPE_N,
    _BPE_POST_CTES
    + f"""
    , win AS (
      SELECT CAST(gpos // 1024 AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM post GROUP BY 1),
    e AS (SELECT CAST(u.e AS INT) AS epoch FROM UNNEST(range({_N_EPOCHS})) u(e)),
    dealt AS (
      SELECT epoch, bin, n_tokens,
        CAST({_h32_sql(f"'{_EPOCH_SEED}:' || CAST(epoch AS VARCHAR) || ':' || CAST(bin AS VARCHAR)")}
             % {_EPOCH_SHARDS} AS INT) AS shard,
        {_h32_sql(f"'{_EPOCH_SEED}:' || CAST(epoch AS VARCHAR) || ':' || CAST(bin AS VARCHAR)", offset=9)}
             AS ord
      FROM win, e)
    SELECT epoch, bin, n_tokens, shard,
           CAST(row_number() OVER (
             PARTITION BY epoch, shard
             ORDER BY ord ASC, bin ASC) AS BIGINT) AS pos
    FROM dealt
    """,
)


@query("windows_epoch_shuffle", oracle=_WEPOCH_ORACLE)
def windows_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-epoch LOADER PLAN over the materialized training windows:
    for each epoch, every window deals into a shard and gets a
    reproducible within-(epoch, shard) position from an independent hash
    word — the `corpus_shard_plan` epoch-shuffle discipline lifted from
    documents to windows, composed with `curriculum_stage_schedule`'s
    (group, shard) exchange shape.  Trainers need exactly this: a
    different deterministic window order per epoch (no fixed-order
    memorization, no RNG state to checkpoint) where membership and
    position are pure functions of (seed, epoch, bin) — resuming epoch 7
    at step k is a filter, not a replay.  Scale shape: window
    materialization is the token-linear chain already certified; the
    plan itself is |epochs|×|windows| rows — map-only expressions, one
    broadcast of the |epochs| side, one (epoch, shard) hash exchange
    with per-group sort, never a global sort (the library operator
    `epoch_shuffle_plan`)."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        epoch_shuffle_plan,
        materialize_packed_windows,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    # pin the encoded streams (the r14 distributed_cumsum discipline)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    ).localCheckpoint()
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, distributed=True
    )
    return epoch_shuffle_plan(
        win, epochs=_N_EPOCHS, num_shards=_EPOCH_SHARDS, seed=_EPOCH_SEED
    )


_FERTILITY_ORACLE = _bpe_sql(
    _BPE_N,
    _BPE_POST_CTES
    + f"""
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length({_NORM_SQL})) AS BIGINT) AS n_chars,
           CAST(sum(coalesce(t.n, 0)) AS BIGINT) AS n_tokens,
           round(sum(length({_NORM_SQL}))
                 / greatest(sum(coalesce(t.n, 0)), 1), 6) AS chars_per_token
    FROM documents d LEFT JOIN dtok t USING (doc_id)
    GROUP BY d.lang
    """,
)


@query("tokenizer_fertility_by_lang", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language: normalized characters per BPE
    token under the learned vocabulary — the compression audit a
    multilingual trainer reads before fixing a tokenizer (a language
    with low chars/token pays more sequence length per sentence; the
    classic fertility/compression-ratio table of tokenizer papers,
    computed from the TRUE tokenization, not the 4-chars/token rule of
    thumb).  Counting never builds a token stream: `bpe_token_profile`
    joins each document's words to their final per-word SEGMENT COUNTS
    (BPE is word-local, so the word table IS the tokenizer) — one
    word-keyed join + one (doc) aggregation, no id assembly, no array
    shuffle — then one (doc)-keyed join to language labels and a
    partial-aggregated group-by gives |languages| output rows; the
    ratio divides two exact integer sums, so a 1000-executor
    aggregation is order-independent and replays bit-identically in
    SQL."""
    from cassandra_util_spark.operators.bpe import bpe_token_profile, bpe_train
    from cassandra_util_spark.operators.text import normalize_text

    d = _t(spark, sf_dir, "documents")
    _, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_token_profile(d, "doc_id", "text", words).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    base = d.select(
        "doc_id", "lang", F.length(normalize_text(F.col("text"))).alias("__chars")
    )
    j = base.join(enc, "doc_id", "left").select(
        "lang",
        "__chars",
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("__toks"),
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__chars").cast("bigint").alias("n_chars"),
        F.sum("__toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("__chars") / F.greatest(F.sum("__toks"), F.lit(1)), 6
        ).alias("chars_per_token"),
    )


# Windows over the CURRICULUM-ordered stream: the cum CTE orders by
# (stage, doc_id) instead of doc_id — everything else is the certified
# window arithmetic.  Stage boundaries are NOT window boundaries (the
# stream is continuous; a window may straddle two stages), which is the
# honest concat-and-chunk semantics — `curriculum_stage_schedule` is the
# no-split per-document schedule when hard boundaries are wanted.
_CURW_BASE = 10**12


def _curriculum_ord(d):
    """``(doc_id, __cur_ord)`` — the ONE copy of the curriculum order key:
    the quality-stage ladder (0.7/0.6/0.5 boundaries, easy→hard) as the
    major key at ``stage·10¹²``, doc id as the tie-break.  Shared by
    `curriculum_packed_windows` and `curriculum_windows_from_store`
    (review r16: the thresholds and the order arithmetic are the semantic
    link to their shared oracle — two hand copies could silently diverge,
    surfacing only as a certification hash mismatch much later).  The
    stage expression is staged as a column (the r15 repeated-subtree
    guard's own discipline)."""
    from cassandra_util_spark.operators.text import quality_score

    q = F.col("__q")
    stage = (
        F.when(q >= 0.7, 0)
        .when(q >= 0.6, 1)
        .when(q >= 0.5, 2)
        .otherwise(3)
        .cast("bigint")
    )
    return d.withColumn("__q", quality_score(F.col("text"))).select(
        "doc_id",
        (stage * F.lit(_CURW_BASE) + F.col("doc_id")).alias("__cur_ord"),
    )


_CURW_ORACLE = _bpe_sql(
    _BPE_N,
    _BPE_VOCAB_CTES
    + f"""
    , {_BPE_SEGIDS_CTE},
    {_BPE_DW_CTE},
    stg AS (
      SELECT doc_id,
             CAST(CASE WHEN q >= 0.7 THEN 0
                       WHEN q >= 0.6 THEN 1
                       WHEN q >= 0.5 THEN 2
                       ELSE 3 END AS BIGINT) * {_CURW_BASE} + doc_id AS ord
      FROM (SELECT doc_id, {_CUR_QUALITY_SQL} AS q FROM documents)),
    dstream AS (
      SELECT d.doc_id, d.pos, s.ids
      FROM dw d JOIN segids s USING (word)),
    dtok AS (
      SELECT doc_id, CAST(sum(len(ids)) AS BIGINT) AS n
      FROM dstream GROUP BY doc_id),
    cum AS (
      SELECT t.doc_id,
             coalesce(CAST(sum(t.n) OVER (ORDER BY o.ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cb
      FROM dtok t JOIN stg o USING (doc_id)),
    flat AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos, k) - 1 AS i,
             tok
      FROM (SELECT doc_id, pos, k, ids[k] AS tok
            FROM dstream, UNNEST(range(1, len(ids) + 1)) u(k))),
    post AS (
      SELECT f.doc_id, c.cb + f.i AS gpos, f.tok
      FROM flat f JOIN cum c USING (doc_id))
    SELECT CAST(gpos // 1024 AS BIGINT) AS bin,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY gpos) AS token_ids
    FROM post GROUP BY 1
    """,
)


@query("curriculum_packed_windows", oracle=_CURW_ORACLE)
def curriculum_packed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training windows over the CURRICULUM-ordered token stream: the
    corpus encodes once, documents concatenate cleanest-first (the
    `curriculum_stage_schedule` stage as the major sort key, doc id as
    the tie-break — the easy→hard schedule curriculum training reads),
    and the stream slices into the same 1024-token windows as
    `packed_training_windows` — so early window ids ARE the easy
    curriculum and a loader consumes bins in order without a separate
    schedule table.  Composition of two certified pieces: the stage
    expression (staged as a column — the r15 repeated-subtree guard's
    own discipline) and the distributed window chain, with the order
    column ``stage·10¹² + doc_id`` (doc ids stay far below 10¹² at
    every ramp scale; the guard in the window chain enforces the
    non-negative cast).  Scale shape identical to the one-shot windows:
    one quality-scored scan, one (id)-keyed assembly, the two-phase
    prefix sum, one slice-piece regroup — the stage join is
    (id)-keyed against the already-pinned encode."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    )
    # ONE pin, after the order-key join: distributed_cumsum executes its
    # input three times, so the full chain (encode + quality-score scan +
    # join) is pinned here (review r15); pinning enc separately too was a
    # wasted extra materialization round-trip of the token arrays — enc
    # has no other consumer, so its chain runs exactly once inside this
    # checkpoint either way (r17)
    enc2 = enc.join(_curriculum_ord(d), "doc_id").localCheckpoint()
    win = materialize_packed_windows(
        enc2, "doc_id", "token_ids", capacity=1024,
        order_col="__cur_ord", distributed=True,
    )
    return win.select(
        "bin",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
    )


@query(
    "ann_recall_audit",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 16),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(CASE WHEN isnan(list_cosine_similarity(c.v, s.cv))
                                     THEN 0 ELSE list_cosine_similarity(c.v, s.cv)
                                END, 4) DESC, s.cell ASC) AS rn
        FROM corpus c CROSS JOIN seeds s) WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 5),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, s.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, s.cv) DESC, s.cell ASC) AS rn
        FROM queries q CROSS JOIN seeds s) WHERE rn <= 4),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY list_cosine_similarity(p.qv, a.v) DESC, a.vec_id ASC) AS rank
        FROM probes p JOIN assigned a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id)
      WHERE rank <= 10),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.vec_id ASC) AS rank
        FROM queries q JOIN corpus c ON c.vec_id <> q.query_id)
      WHERE rank <= 10)
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(i.neighbor_id) AS BIGINT) AS hits,
           round(count(i.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact e LEFT JOIN ivf i USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall@10 of the IVF index against the exact scan, per
    query — the audit an operator reads before trusting an approximate
    index at 100 TB (the repo's own discipline: the r14 verdict rejected
    an ANN route because a recall number was a replica artifact; this
    query makes that measurement a standing, hash-certified fixture).
    Both sides are the already-certified operators (`ann_cosine_topk`,
    `ann_ivf_topk`: K=16 deterministic seeds, nprobe=4, refine_iters=0
    so the oracle replays the assignment argmax exactly); the audit is
    one (query, neighbor) left join and a 5-row aggregate.  Scale shape:
    exact is the O(N·|queries|) side — at production scale the audit
    runs on a sampled query set (|queries| fixed), which is exactly this
    query's shape."""
    from cassandra_util_spark.operators.similarity import cosine_topk, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = cosine_topk(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    ivf = ivf_topk(
        e, q, "vec_id", "embedding",
        k=10, num_centroids=16, nprobe=4, refine_iters=0,
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    j = exact.join(ivf, ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("__hit").cast("bigint").alias("hits"),
        F.round(F.count("__hit") / 10.0, 6).alias("recall_at_10"),
    )


@query(
    "lsh_recall_audit",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM toks WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5),
    h AS (SELECT doc_id, {_p31('sh')} AS h FROM sh),
    sig AS (
      SELECT doc_id, p.j, min((p.a * h.h + p.b) % 2147483647) AS v
      FROM h CROSS JOIN {_minhash_params_sql(64)}
      GROUP BY doc_id, p.j),
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS bucket
      FROM sig GROUP BY doc_id, j // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    m AS (
      SELECT c.id_a, c.id_b, count(*) FILTER (WHERE sa.v = sb.v) AS matches
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b AND sb.j = sa.j
      GROUP BY 1, 2),
    lsh AS (
      SELECT id_a, id_b FROM m WHERE round(matches / 64.0, 6) >= 0.5),
    joined AS (
      SELECT coalesce(e.id_a, l.id_a) AS id_a,
             e.id_a IS NOT NULL AS in_exact,
             l.id_a IS NOT NULL AS in_lsh
      FROM exact e FULL OUTER JOIN lsh l
        ON e.id_a = l.id_a AND e.id_b = l.id_b)
    SELECT CAST(count(*) FILTER (WHERE in_exact) AS BIGINT) AS n_exact,
           CAST(count(*) FILTER (WHERE in_lsh) AS BIGINT) AS n_lsh,
           CAST(count(*) FILTER (WHERE in_exact AND in_lsh) AS BIGINT) AS hits,
           round(count(*) FILTER (WHERE in_exact AND in_lsh)
                 / greatest(count(*) FILTER (WHERE in_exact), 1), 6) AS recall,
           round(count(*) FILTER (WHERE in_exact AND in_lsh)
                 / greatest(count(*) FILTER (WHERE in_lsh), 1), 6) AS precision
    FROM joined
    """,
)
def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall AND precision of MinHash(64)+LSH(16 bands) against
    the exact 3-gram Jaccard pairs at threshold 0.5 — the dedup twin of
    `ann_recall_audit`: before trusting the probabilistic pipeline on a
    100 TB crawl, an operator reads this one-row fixture (both sides the
    already-certified operators, down to the md5-word hash family the
    oracle replays).  At production scale the exact side runs on a
    sampled partition while LSH runs on everything — the audit's shape
    (one pair-set full outer join, one summary row) is unchanged."""
    from cassandra_util_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingle_rows,
    )

    d = _t(spark, sf_dir, "documents")
    # ONE corpus scan + shingle pass, pinned, feeds BOTH sides: the exact
    # and LSH pipelines project the shingle stream differently ((id, sh)
    # distinct vs (id, h31)), so Catalyst never shares the scan between
    # them — without the pin the normalize+shingle explode ran twice per
    # audit (r18; eager so both plan branches read the pinned blocks
    # instead of racing to materialize a lazy checkpoint)
    sh = shingle_rows(d, "doc_id", "text", 3).localCheckpoint()
    exact = ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, shingles=sh
    ).select("id_a", "id_b", F.lit(1).alias("__e"))
    lsh = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.5,
        shingles=sh,
    ).select("id_a", "id_b", F.lit(1).alias("__l"))
    j = exact.join(lsh, ["id_a", "id_b"], "full_outer")
    both = F.col("__e").isNotNull() & F.col("__l").isNotNull()
    return j.agg(
        F.count("__e").cast("bigint").alias("n_exact"),
        F.count("__l").cast("bigint").alias("n_lsh"),
        F.count(F.when(both, 1)).cast("bigint").alias("hits"),
        F.round(
            F.count(F.when(both, 1)) / F.greatest(F.count("__e"), F.lit(1)), 6
        ).alias("recall"),
        F.round(
            F.count(F.when(both, 1)) / F.greatest(F.count("__l"), F.lit(1)), 6
        ).alias("precision"),
    )


@query(
    "simhash_recall_audit",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
    tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM tk WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5),
    toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents),
    hh AS (
      SELECT doc_id, {_p32('t', 1)} AS hi, {_p32('t', 9)} AS lo FROM toks),
    bits AS (
      SELECT doc_id, b.i AS i,
             sum(CASE WHEN ((CASE WHEN b.i < 32 THEN lo >> b.i
                                  ELSE hi >> (b.i - 32) END) & 1) = 1
                      THEN 1 ELSE -1 END) AS s
      FROM hh CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b
      GROUP BY doc_id, b.i),
    chunks AS (
      SELECT doc_id, i // 16 AS c,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << (i % 16)) ELSE 0 END) AS val
      FROM bits GROUP BY doc_id, i // 16),
    simpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             sum(bit_count(xor(a.val, b.val))) AS hamming
      FROM chunks a JOIN chunks b ON a.c = b.c AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    simh AS (SELECT id_a, id_b FROM simpairs WHERE hamming <= 3),
    joined AS (
      SELECT e.id_a IS NOT NULL AS in_exact, s.id_a IS NOT NULL AS in_sim
      FROM exact e FULL OUTER JOIN simh s
        ON e.id_a = s.id_a AND e.id_b = s.id_b)
    SELECT CAST(count(*) FILTER (WHERE in_exact) AS BIGINT) AS n_exact,
           CAST(count(*) FILTER (WHERE in_sim) AS BIGINT) AS n_simhash,
           CAST(count(*) FILTER (WHERE in_exact AND in_sim) AS BIGINT) AS hits,
           round(count(*) FILTER (WHERE in_exact AND in_sim)
                 / greatest(count(*) FILTER (WHERE in_exact), 1), 6) AS recall,
           round(count(*) FILTER (WHERE in_exact AND in_sim)
                 / greatest(count(*) FILTER (WHERE in_sim), 1), 6) AS precision
    FROM joined
    """,
)
def simhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third member of the measured-fidelity audit family
    (`ann_recall_audit`, `lsh_recall_audit`): SimHash64 pairs at
    Hamming ≤ 3 measured against the exact 3-gram Jaccard pairs at
    0.5 — CROSS-method by construction (SimHash approximates token-
    frequency cosine, not set Jaccard), so this is the fixture that
    tells an operator what hamming≤3 actually buys on THEIR corpus
    before choosing between the two near-dup pipelines.  One-row
    summary, both sides already-certified operators."""
    from cassandra_util_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5).select(
        "id_a", "id_b", F.lit(1).alias("__e")
    )
    sim = simhash_pairs(d, "doc_id", "text", max_hamming=3).select(
        "id_a", "id_b", F.lit(1).alias("__s")
    )
    j = exact.join(sim, ["id_a", "id_b"], "full_outer")
    both = F.col("__e").isNotNull() & F.col("__s").isNotNull()
    return j.agg(
        F.count("__e").cast("bigint").alias("n_exact"),
        F.count("__s").cast("bigint").alias("n_simhash"),
        F.count(F.when(both, 1)).cast("bigint").alias("hits"),
        F.round(
            F.count(F.when(both, 1)) / F.greatest(F.count("__e"), F.lit(1)), 6
        ).alias("recall"),
        F.round(
            F.count(F.when(both, 1)) / F.greatest(F.count("__s"), F.lit(1)), 6
        ).alias("precision"),
    )


# --- Round-16 driver-window rotation -------------------------------------
#
# The driver certifies the FIRST 50 names in QUERIES each round.  The
# r15 window (the 11 round-14 trainer rows plus 39 least-recently-
# certified re-certs) came back 50/50 green in CORRECTNESS_r15, so the
# whole prefix turns over.  Rotate in the 7 round-15 additions that
# have never been driver-checked (all green in the committed 213/213
# local value-hash oracle), then fill the remaining 43 slots with the
# least-recently-certified queries: the six rows last certified in
# r11 (q22_idle_balances, pii_redaction, pii_audit_report,
# retention_rule_impact, pareto_document_selection,
# stream_interval_join_view) and 37 rows last certified in r12 —
# computed from CORRECTNESS_r01..r15; ties broken by certification
# count then registration order.  Every rotate-in was re-verified
# against its local oracle at sf0.01 immediately before this commit.
# A green CORRECTNESS_r16 completes cumulative driver certification
# at 213/213 — every registered query driver-checked at least once
# and green in its latest appearance.
#
# Family coverage in the window is preserved: streaming (window
# store, interval join), trainer windows (epoch shuffle, curriculum),
# tokenizer (fertility), measured-fidelity audits (ANN/LSH/SimHash
# recall), PII (redaction + audit), retention (rule impact), dedup
# (clusters, spans, bloom, containment, soft-keep, fingerprint),
# retrieval (BM25, passage, eval, hard negatives), sampling
# (stratified, weighted-repeat), corpus text (commonness, bigram LM,
# adaptive bounds, repetition), events (anomalies, cube, skew,
# sliding window, z-order), embeddings (mean pool, prototypes),
# TPC-H (q22) and ledger/rollup reconciliation.

_WINDOW_ROTATE_IN_R16 = [
    # never driver-checked (round-15 additions, all local-oracle green)
    "windows_streaming_store",
    "windows_epoch_shuffle",
    "tokenizer_fertility_by_lang",
    "curriculum_packed_windows",
    "ann_recall_audit",
    "lsh_recall_audit",
    "simhash_recall_audit",
    # least-recently-certified re-certs (last certified r11)
    "q22_idle_balances",
    "pii_redaction",
    "pii_audit_report",
    "retention_rule_impact",
    "pareto_document_selection",
    "stream_interval_join_view",
    # last certified r12 (registration order)
    "acctbal_histogram_percentiles",
    "adaptive_length_bounds",
    "bigram_lm_quality",
    "bm25_batch_search",
    "commonness_buckets",
    "decontamination",
    "dedup_cluster_sizes",
    "dedup_clusters",
    "dedup_fingerprint_longest",
    "dedup_incremental_bloom",
    "dedup_ngram_containment",
    "dedup_soft_keep",
    "dedup_span_removal",
    "dedup_within_doc_spans",
    "doc_chunks",
    "doc_commonness",
    "doc_length_histogram",
    "doc_repetition_filter",
    "doc_top_terms",
    "embedding_mean_pool",
    "embedding_prototypes",
    "events_activity_anomalies",
    "events_cube_profile",
    "events_skew_report",
    "events_sliding_window_sum",
    "events_zorder_layout",
    "hard_negatives",
    "lang_confusion_matrix",
    "mixture_temperature_plan",
    "orders_ledger_reconciliation",
    "orders_rollup_totals",
    "passage_dup_share",
    "passage_retrieval",
    "retrieval_eval",
    "stratified_sample_docs",
    "stratified_topk_docs",
    "weighted_repeat_docs",
]


_rotate_driver_window(_WINDOW_ROTATE_IN_R16)  # the full r15 window turns over (all green in r15)


# --- Round-16 additions (registered after the rotation: appended past the
# driver window, so the certified first-50 prefix is untouched) ------------

# Frequency-capped word table for the byte-fallback fixture: the corpus
# has 31 distinct normalized words at EVERY SF (template-generated), so a
# top-24 cap — the SentencePiece/GPT-2 vocab_size production shape —
# plants 7 genuinely out-of-vocabulary words at every scale.
_BPE_OOV_KEEP = 24

# CTE prefix shared with the r17 decode-round-trip oracle: everything
# through `allseg` (capped word table + byte-fallback segmentation of the
# corpus's OOV words), without the final per-document stream render.
_BPE_OOV_CTES = (
    _BPE_VOCAB_CTES
    + f"""
    , params AS (
      SELECT (SELECT count(*) FROM basec)
             + (SELECT coalesce(max(step), -1) + 1 FROM mrg) AS byte_base,
             (SELECT id FROM vocab WHERE sym = '{END_SYM}') AS end_id),
    kept AS (
      SELECT * FROM w{_BPE_N} ORDER BY cnt DESC, word LIMIT {_BPE_OOV_KEEP}),
    segids AS (
      SELECT word, list(id ORDER BY j) AS ids
      FROM (SELECT w.word, t.j, w.s[t.j] AS sym
            FROM kept w, UNNEST(range(1, len(w.s) + 1)) t(j)) q
      JOIN vocab v USING (sym)
      GROUP BY word),
    {_BPE_DW_CTE},
    oovseg AS (
      SELECT word,
             list_concat(
               list_transform(regexp_extract_all(word, '.'),
                              c -> p.byte_base + ascii(c)),
               [p.end_id]) AS ids
      FROM (SELECT DISTINCT word FROM dw
            WHERE word NOT IN (SELECT word FROM kept)) o
      CROSS JOIN params p),
    allseg AS (SELECT * FROM segids UNION ALL SELECT * FROM oovseg)"""
)

_BPE_OOV_SELECT = (
    _BPE_OOV_CTES
    + f"""
    , enc AS (
      SELECT d.doc_id,
             string_agg(array_to_string(s.ids, ' '), ' ' ORDER BY d.pos)
               AS token_ids,
             CAST(sum(len(s.ids)) AS BIGINT) AS n_tokens,
             CAST(sum(len(list_filter(s.ids, t -> t >= p.byte_base)))
               AS BIGINT) AS n_byte_tokens
      FROM dw d JOIN allseg s USING (word) CROSS JOIN params p
      GROUP BY d.doc_id)
    SELECT doc.doc_id,
           coalesce(e.token_ids, '') AS token_ids,
           CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(e.n_byte_tokens, 0) AS BIGINT) AS n_byte_tokens
    FROM documents doc LEFT JOIN enc e USING (doc_id)
    """
)


@query("bpe_encode_oov_fallback", oracle=_bpe_sql(_BPE_N, _BPE_OOV_SELECT))
def bpe_encode_oov_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FROZEN-vocabulary encode of data beyond the training corpus —
    the actual production tokenizer shape (VERDICT r15 task 2): the word
    table is capped to the top-{K} by frequency (the vocab_size cap every
    production tokenizer ships with), and every word that falls outside
    it encodes as its UTF-8 byte tokens from the vocabulary's reserved
    256-id byte block (``bpe_vocab(byte_fallback=True)``, the
    SentencePiece ``byte_fallback`` / GPT-2 byte-level convention)
    instead of killing the job — the degradation-ladder philosophy
    (`plans/rules.py` spooked ladder; reference
    RuleBasedDeletionConvictor.java:238-251 degrades the compaction, it
    does not abort it) applied to the one place the pipeline surface
    still raised on production-shaped input.  Scale: the fallback adds
    one vocabulary-sized anti-join and a map-only byte expansion — the
    corpus-sized assembly is unchanged; the oracle replays the cap, the
    reserved-id arithmetic, and the per-byte ids in SQL (normalized
    words are ASCII, so DuckDB's per-char code points equal Spark's
    UTF-8 bytes).  ``n_byte_tokens`` certifies the fallback actually
    fired (7 planted OOV words at every SF)."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    kept = words.orderBy(F.col("cnt").desc(), "word").limit(_BPE_OOV_KEEP)
    vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
    byte_base = int(
        vocab.filter(F.col("kind") == "byte").agg(F.min("id")).first()[0]
    )
    enc = bpe_encode_ids(d, "doc_id", "text", kept, vocab, oov="bytes")
    return enc.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
        "n_tokens",
        F.size(
            F.filter("token_ids", lambda t: t >= F.lit(byte_base))
        ).cast("bigint").alias("n_byte_tokens"),
    )


@query(
    "ivfpq_recall_audit",
    oracle=f"""
    WITH approx AS ({_ivfpq_oracle_sql()}),
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    queries AS (SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 5),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round({_pq_l2sq_sql("q.qv[i]", "c.v[i]", 64)}, 4)
                          ASC, c.vec_id ASC) AS rank
        FROM queries q JOIN corpus c ON c.vec_id <> q.query_id)
      WHERE rank <= 10)
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS hits,
           round(count(a.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact e
    LEFT JOIN (SELECT query_id, neighbor_id FROM approx) a
      USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def ivfpq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall@10 of the certified IVFADC configuration
    (`ann_ivfpq_topk`: coarse_k=16, nprobe=4, m=8, num_codes=16,
    rerank=64, seed centroids/codebooks) against the exact squared-L2
    scan — the fourth member of the measured-fidelity audit family
    (`ann_recall_audit` covers IVF/cosine, `lsh_recall_audit` and
    `simhash_recall_audit` the near-dup pipelines; VERDICT r15 task 3).
    This is the fixture that answers, from the registry and hash-
    certified, what the 100 TB memory budget's 4× code compression plus
    nprobe/K cell pruning actually costs in recall — previously the
    number lived only in pytest (tests/test_ivfpq.py recall ladder,
    measured 43/50 for the Lloyd-refined full-probe config; this audits
    the SQL-replayable certified config).  Measured at sf0.01: mean
    recall@10 = 0.32 (per-query 0.9/0.1/0.1/0.1/0.4) — the standing
    record that the UNREFINED pruned config is a plumbing-certification
    config, not a serving config: recall is bought with refine_iters /
    nprobe / rerank (the pytest ladder), and the decontamination ANN
    route stays rejected on exactly this kind of measurement (r14).
    Both sides are certified
    operators (`l2_topk` shares the family's exact-rerank semantics:
    4dp-rounded L2, smaller-id ties); the audit adds one (query,
    neighbor) left join and a 5-row aggregate.  Scale shape: exact is
    the O(N·|queries|) side — at production scale the audit runs on a
    sampled query set (|queries| fixed), which is exactly this query's
    shape."""
    from cassandra_util_spark.operators.similarity import ivfpq_topk, l2_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = l2_topk(e, q, k=10).select("query_id", "neighbor_id")
    approx = ivfpq_topk(
        e, q, k=10, coarse_k=16, nprobe=4, m=8, num_codes=16, rerank=64,
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("__hit").cast("bigint").alias("hits"),
        F.round(F.count("__hit") / 10.0, 6).alias("recall_at_10"),
    )


@query("epoch_plan_from_store", oracle=None)
def epoch_plan_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-epoch loader plan computed from the PERSISTED window
    store instead of re-materializing windows in-plan — the production
    loader shape (VERDICT r15 task 4): `windows_epoch_shuffle` certifies
    the plan over an in-memory materialization, but a real trainer's
    windows live in `windows_streaming_store`'s on-disk runs, and its
    epoch order must come from READING them, the store-vs-rebuild
    discipline of `heavy_hitters_from_store`.  Builds the store exactly
    as `windows_streaming_store` does (3 ascending micro-batches through
    the carry protocol), then `epoch_shuffle_plan` over the LWW-merged
    view — no window re-materialization, and the plan needs only
    (bin, n_tokens), so Catalyst prunes the token arrays out of the
    store read entirely (the loader PLAN reads window METADATA, ~16
    bytes/window, not the ~4 KB token payload — pinned by the
    ReadSchema assert in tests/test_stream_windows.py).  Hash-certified
    against `windows_epoch_shuffle`'s full one-shot SQL replay (shared
    oracle): the persisted store and the in-memory twin must induce the
    IDENTICAL (epoch, shard, pos) assignment."""
    from cassandra_util_spark.operators.packing import epoch_shuffle_plan

    store = _corpus_window_store(spark, sf_dir)
    view = store.read_merged(spark).select("bin", "n_tokens")
    return epoch_shuffle_plan(
        view, epochs=_N_EPOCHS, num_shards=_EPOCH_SHARDS, seed=_EPOCH_SEED
    )


# the store-backed plan must hash-match the in-memory twin's full SQL
# replay — one oracle, two execution paths (the store-vs-rebuild
# discipline; same sharing shape as bpe_streaming_encode)
ORACLES["epoch_plan_from_store"] = ORACLES["windows_epoch_shuffle"]


@query("curriculum_windows_from_store", oracle=None)
def curriculum_windows_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curriculum half of the store-backed loader surface
    (`epoch_plan_from_store` is the epoch-shuffle half; VERDICT r15
    task 4): `curriculum_packed_windows` materializes the easy→hard
    window stream in-plan, but in production the curriculum corpus
    lands as INGEST WAVES — each quality stage a micro-batch — and the
    windows must persist as they land.  This streams the curriculum-
    ordered corpus through `stream_windows` KEYED ON THE CURRICULUM
    ORDER (``cur_ord = stage·10¹² + doc_id``, one micro-batch per stage,
    ascending by construction): the carry protocol is keyed on any
    monotone non-negative bigint, not just doc ids (the general
    mechanism is pinned by
    tests/test_stream_windows.py::test_stream_windows_on_a_monotone_order_key),
    so stage k+1's boundary document straddles into stage k's partial
    window exactly as the one-shot concat-and-chunk semantics demand.
    Hash-certified against `curriculum_packed_windows`'s full SQL
    replay (shared oracle): the persisted store's LWW view must equal
    the in-memory curriculum windows bin-for-bin, token-for-token.
    Scale shape: the certified streaming-store shape (per-batch cost ∝
    batch, one clustered append + O(capacity) carry read per stage)
    over the certified curriculum order."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    enc = bpe_encode_ids(
        d, "doc_id", "text", words, bpe_vocab(spark, words, merges)
    )
    # ONE pin after the order-key join (r17, same reasoning as
    # curriculum_packed_windows: enc has no other consumer here, so a
    # separate enc pin was a wasted extra materialization round-trip)
    enc2 = enc.join(_curriculum_ord(d), "doc_id").select(
        F.col("__cur_ord").alias("cur_ord"), "token_ids"
    ).localCheckpoint()
    # one ingest wave per quality stage (stage k's keys live in
    # [k·BASE, (k+1)·BASE) — ascending by construction; a wave may be
    # empty, which the carry protocol treats as a no-op batch)
    shards = [
        enc2.filter(
            (F.col("cur_ord") >= k * _CURW_BASE)
            & (F.col("cur_ord") < (k + 1) * _CURW_BASE)
        )
        for k in range(4)
    ]
    store = _drain_windows_store(
        spark, shards, "cur_ord", capacity=1024, prefix="win-cur"
    )
    return _windows_store_view(spark, store)


# the persisted curriculum windows must hash-match the in-memory twin's
# full SQL replay — one oracle, two execution paths
ORACLES["curriculum_windows_from_store"] = ORACLES["curriculum_packed_windows"]


@query("tokenizer_persisted_encode", oracle=None)
def tokenizer_persisted_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train-once / encode-anywhere round trip: train, persist the
    frozen tokenizer artifact (`sources/tokenizer.py` — merges + the
    top-{K} frequency-capped word table + the byte-fallback vocabulary,
    plain parquet plus a _META.json contract), read it back as a fresh
    consumer would, and encode the full corpus with ``oov="bytes"`` —
    hash-certified against `bpe_encode_oov_fallback`'s full SQL replay
    (shared oracle), so the persisted artifact provably induces the
    byte-identical token stream the in-memory tokenizer does (the
    store-vs-rebuild discipline, applied to the tokenizer itself).  At
    100 TB this is the actual production shape: `bpe_train` runs once;
    every later crawl shard mounts the megabyte-sized artifact
    (vocabulary-sized tables, broadcast whole) and pays only the encode."""
    import tempfile

    from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_train
    from cassandra_util_spark.sources.tokenizer import (
        read_tokenizer,
        write_tokenizer,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    path = tempfile.mkdtemp(prefix="tokenizer-") + "/bpe"
    write_tokenizer(
        spark, path, words, merges,
        byte_fallback=True, capped_words=_BPE_OOV_KEEP,
    )
    _, kept, vocab, _ = read_tokenizer(spark, path)
    byte_base = int(
        vocab.filter(F.col("kind") == "byte").agg(F.min("id")).first()[0]
    )
    enc = bpe_encode_ids(d, "doc_id", "text", kept, vocab, oov="bytes")
    return enc.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
        "n_tokens",
        F.size(
            F.filter("token_ids", lambda t: t >= F.lit(byte_base))
        ).cast("bigint").alias("n_byte_tokens"),
    )


# the persisted tokenizer must induce the byte-identical stream the
# in-memory tokenizer does — one oracle, two execution paths
ORACLES["tokenizer_persisted_encode"] = ORACLES["bpe_encode_oov_fallback"]


@query(
    "bpe_roundtrip_oov",
    oracle=f"SELECT doc_id, {_NORM_SQL} AS text FROM documents",
)
def bpe_roundtrip_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The losslessness contract EXTENDED THROUGH BYTE FALLBACK: encode
    the full corpus against the frequency-capped frozen vocabulary
    (every word the top-{K} cap dropped degrades to ``<0xNN>`` byte
    tokens — 7 planted OOV words at every SF), decode the id streams
    back — byte runs reassembling WHOLE before UTF-8 decoding — and
    hash-match the SQL-side normalized text directly.  `bpe_roundtrip_text`
    certifies the in-vocabulary loop; this one certifies that the r16
    degradation path (VERDICT r15 task 2) keeps the identity
    ``decode(encode(text)) == normalize_text(text)`` even when ~15% of
    tokens travel as bytes — the property that makes byte fallback SAFE
    to default to in production, not just non-fatal.  Scale shape: the
    certified encode + decode chains, both token-linear."""
    from cassandra_util_spark.operators.bpe import (
        bpe_decode,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    kept = words.orderBy(F.col("cnt").desc(), "word").limit(_BPE_OOV_KEEP)
    vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
    ids = bpe_encode_ids(d, "doc_id", "text", kept, vocab, oov="bytes")
    return bpe_decode(ids, "doc_id", "token_ids", vocab=vocab)


@query("tokenizer_streaming_encode", oracle=None)
def tokenizer_streaming_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the byte-fallback contract, against the
    PERSISTED artifact — the end-state production tokenizer pipeline:
    `bpe_train` ran once, `write_tokenizer` shipped the frozen artifact
    (top-{K} capped word table + byte-fallback vocabulary), and new crawl
    lands as a stream that `stream_encode(oov="bytes")` tokenizes
    shard-by-shard into a persisted RunStore — every word outside the
    shipped cap degrading to byte tokens inline, never killing the
    ingest.  Hash-certified against `bpe_encode_oov_fallback`'s full SQL
    replay (shared oracle): the streamed store's LWW view must equal the
    one-batch frozen-vocab encode byte for byte, regardless of batch
    boundaries (`bpe_streaming_encode` certifies the same convergence
    for the uncapped raise-mode tokenizer).  Composes three certified
    pieces: the artifact round trip (`tokenizer_persisted_encode`), the
    inline byte fallback, and the idempotent streamed encode."""
    import tempfile

    from cassandra_util_spark.operators.bpe import bpe_train
    from cassandra_util_spark.sources.tokenizer import (
        read_tokenizer,
        write_tokenizer,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    path = tempfile.mkdtemp(prefix="tokenizer-stream-") + "/bpe"
    write_tokenizer(
        spark, path, words, merges,
        byte_fallback=True, capped_words=_BPE_OOV_KEEP,
    )
    _, kept, vocab, _ = read_tokenizer(spark, path)
    byte_base = int(
        vocab.filter(F.col("kind") == "byte").agg(F.min("id")).first()[0]
    )
    src = _pinned_shard_src(
        [d.filter(F.col("doc_id") % 3 == k) for k in range(3)],
        ["doc_id", "text"],
        "tok-stream",
    )
    store = _drain_encode_store(spark, src, kept, vocab, "tok-enc")
    view = store.read_merged(spark)
    return view.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids"),
        "n_tokens",
        F.size(
            F.filter("token_ids", lambda t: t >= F.lit(byte_base))
        ).cast("bigint").alias("n_byte_tokens"),
    )


# the streamed frozen-artifact encode must converge to the one-batch
# byte-fallback encode — one oracle, three execution paths now
# (in-memory, persisted-artifact, streamed-persisted-artifact)
ORACLES["tokenizer_streaming_encode"] = ORACLES["bpe_encode_oov_fallback"]


# --- Round-17 driver-window rotation (VERDICT r15 discipline, continued) ---
# The full r16 window (all 50 green in CORRECTNESS_r16) turns over.  In come
# the 7 round-16 additions — the byte-fallback encode trio sharing one oracle
# (in-memory / persisted-artifact / streamed-artifact), the OOV round-trip,
# the IVFPQ recall fixture, and the two store-backed loader twins — plus 43
# least-recently-certified re-certs (13 last certified r12, then 30 last
# certified r13, registration order within equal (round, count)).  Family
# coverage in the window: dedup (exact/fingerprint/simhash/jaccard/winnowing/
# spans/LSH/star), tokenizer+packing, ANN/PQ, retention/CDC/compaction,
# sampling, retrieval, TPC-H (q1, q9), streaming (funnel, logcost), events.

_WINDOW_ROTATE_IN_R17 = [
    # never driver-checked (round-16 additions, all local-oracle green)
    "bpe_encode_oov_fallback",
    "ivfpq_recall_audit",
    "epoch_plan_from_store",
    "curriculum_windows_from_store",
    "tokenizer_persisted_encode",
    "bpe_roundtrip_oov",
    "tokenizer_streaming_encode",
    # least-recently-certified re-certs (last certified r12)
    "dedup_ngram_jaccard_capped",
    "dedup_fingerprint",
    "events_json_props",
    "media_frame_plan",
    "odd_pk_filter",
    "orders_profile",
    "orders_status_rollup",
    "paged_fetch",
    "token_count_regex",
    "writetime_projection",
    "ann_cosine_topk",
    "dedup_exact",
    "dedup_simhash",
    # last certified r13 (certification count, then registration order)
    "weighted_sample_logcost",
    "logcost_streaming_sample",
    "weighted_sample_by_lang",
    "corpus_budget_cut",
    "padding_waste_report",
    "mixture_budget_execution",
    "dedup_token_spans",
    "cdc_apply",
    "tombstone_compaction",
    "q9_product_type_profit",
    "bucketed_colocated_join",
    "embedding_quantize",
    "dedup_clusters_star",
    "training_corpus_assembly",
    "sketch_heavy_hitters",
    "runstore_leveled_view",
    "dedup_incremental_lsh",
    "bm25_search",
    "sequence_packing",
    "dedup_winnowing",
    "events_funnel",
    "contamination_report",
    "lang_id",
    "doc_fingerprint",
    "retention_rules_antijoin",
    "set_ops_except_intersect",
    "retention_ttl_mixed_keys",
    "events_user_gaps",
    "semantic_dedup",
    "q1_pricing_summary",
]


_rotate_driver_window(_WINDOW_ROTATE_IN_R17)  # the full r16 window turns over (all green in r16)


# --- Round-17 additions (registered after the rotation: appended past the
# driver window, so the certified first-50 prefix is untouched) ------------

# Decode-round-trip oracle: re-derives, in SQL, the per-document window
# count and token count under the CAPPED byte-fallback vocabulary (the
# window arithmetic over the OOV-degraded streams) plus the normalized
# text the full inversion chain must restore.  The Spark side earns its
# hash by actually running encode → pack → reassemble → decode; the
# oracle recomputes the invariants from first principles.
def _windecode_sql(extra_cte: str = "", from_extra: str = "",
                   where: str = "") -> str:
    """The decode-round-trip oracle body — window/token arithmetic over
    the capped byte-fallback streams plus the restored-text projection —
    with hook points for the lookup variant's range restriction (review
    r17: `_WINLOOKUP_ORACLE` previously duplicated this tail verbatim;
    a window-arithmetic fix must land exactly once)."""
    return (
        _BPE_OOV_CTES
        + f"""
    , dtok AS (
      SELECT d.doc_id, CAST(sum(len(s.ids)) AS BIGINT) AS n
      FROM dw d JOIN allseg s USING (word)
      GROUP BY d.doc_id),
    cum AS (
      SELECT doc_id, n,
             coalesce(CAST(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cb
      FROM dtok),
    wins AS (
      SELECT doc_id, n AS n_tokens,
             CAST((cb + n - 1) // 1024 - cb // 1024 + 1 AS BIGINT)
               AS n_windows
      FROM cum WHERE n > 0){extra_cte}
    SELECT doc.doc_id,
           CAST(coalesce(w.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(w.n_tokens, 0) AS BIGINT) AS n_tokens,
           array_to_string(
             list_filter(string_split({_NORM_SQL}, ' '), x -> x <> ''),
             ' ') AS restored
    FROM documents doc LEFT JOIN wins w USING (doc_id){from_extra}
    {where}"""
    )


_WINDECODE_ORACLE = _bpe_sql(_BPE_N, _windecode_sql())


def _oov_capped(spark, sf_dir: str):
    """``(d, kept, vocab)`` — the capped byte-fallback MODEL fixture
    (train + top-{K} cap + byte-fallback vocabulary), without any
    encode.  Streaming consumers (`tokenizer_coverage_drift`) stop
    here: they re-encode through `stream_encode` anyway, and
    `_oov_frozen`'s eager batch encode would run the whole corpus
    chain for nothing (review r17)."""
    from cassandra_util_spark.operators.bpe import bpe_train, bpe_vocab

    d = _t(spark, sf_dir, "documents")
    merges, words = bpe_train(d, "text", num_merges=_BPE_N)
    kept = words.orderBy(F.col("cnt").desc(), "word").limit(_BPE_OOV_KEEP)
    vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
    return d, kept, vocab


def _oov_frozen(spark, sf_dir: str):
    """``(d, kept, vocab, enc)`` — `_oov_capped` plus the one-shot
    ``oov="bytes"`` encode, pinned once: the fixture of the
    decode-round-trip queries (review r17: one copy)."""
    from cassandra_util_spark.operators.bpe import bpe_encode_ids

    d, kept, vocab = _oov_capped(spark, sf_dir)
    enc = bpe_encode_ids(
        d, "doc_id", "text", kept, vocab, oov="bytes"
    ).localCheckpoint()
    return d, kept, vocab, enc


def _decode_roundtrip_view(d, win, vocab) -> DataFrame:
    """(doc_id, n_windows, n_tokens, restored) — the shared inversion
    tail of the two decode-round-trip queries (review r17: one copy,
    two callers).  One span struct per (window, doc) piece ⇒ span count
    = windows touched, span-length sum = the doc's token count — both
    read off the attribution map, so the reassembled stream feeds ONLY
    the decode.  ``win`` must be pinned by the caller: it feeds two plan
    branches (the span aggregate and reassemble → decode)."""
    from cassandra_util_spark.operators.bpe import bpe_decode
    from cassandra_util_spark.operators.packing import reassemble_doc_streams

    nwin = (
        win.select(F.explode("doc_spans").alias("s"))
        .groupBy(F.col("s")["doc"].alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.col("s")["len"]).cast("bigint").alias("n_tokens"),
        )
    )
    dec = bpe_decode(
        reassemble_doc_streams(win), "doc_id", "token_ids", vocab=vocab
    ).select("doc_id", F.col("text").alias("restored"))
    return (
        d.select("doc_id")
        .join(nwin, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("restored", F.lit("")).alias("restored"),
        )
    )


@query("windows_decode_roundtrip", oracle=_WINDECODE_ORACLE)
def windows_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL-CIRCLE loader audit: frozen capped-vocab encode (OOV
    words degraded to byte tokens) → 1024-token packed windows →
    `reassemble_doc_streams` (the r17 inverse operator: slice pieces →
    one (doc)-keyed shuffle) → `bpe_decode` → the exact normalized
    source text, per document.  This certifies the production
    contract the r16 torn-run guard enforces from the other side:
    window payloads are NOT decodable in place (a capacity boundary can
    cut a byte-fallback run mid-character — `bpe_decode` on a raw
    payload now raises), so the inspection/detokenization path must
    reassemble per document FIRST, and this fixture hash-proves that
    composed path restores every document byte-for-byte while the
    oracle recomputes the window/token counts and the normalized text
    from first principles.  Scale shape: the inverse shuffles the same
    ~4 bytes/token slice pieces the packer shuffled in — the
    information floor, no per-token rows anywhere — and the decode is
    map-only (the literal-map vocab path)."""
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    d, _, vocab, enc = _oov_frozen(spark, sf_dir)
    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=1024, with_spans=True,
        distributed=True,
    ).localCheckpoint()
    return _decode_roundtrip_view(d, win, vocab)


@query("windows_store_decode_roundtrip", oracle=None)
def windows_store_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store-backed twin of `windows_decode_roundtrip` (the
    store-vs-rebuild discipline of `epoch_plan_from_store`): the SAME
    capped byte-fallback encode streams through `stream_windows` in
    three ascending doc-id micro-batches into a persisted window store,
    and the inversion chain — reassemble → decode — runs over the
    store's LWW-MERGED READ (bin, token_ids, doc_spans) instead of the
    in-plan windows.  Shared oracle: the restored text and per-document
    window/token counts must hash-match the in-memory twin exactly,
    certifying that the persisted attribution spans survive the store
    round-trip (append → LWW merge → carry supersession) well enough to
    drive the production detokenization path.  This is the fixture a
    100 TB trainer actually needs: windows land as the crawl streams
    in, and any doc is recoverable from the store alone."""
    d, _, vocab, enc = _oov_frozen(spark, sf_dir)
    store = _drain_windows_store(
        spark, _ascending_id_shards(enc), "doc_id", capacity=1024,
        prefix="win-dec",
    )
    # pinned: the merged read feeds two plan branches (review r17 — an
    # unpinned read would scan + LWW-merge the store twice)
    win = store.read_merged(spark).select(
        "bin", "token_ids", "doc_spans"
    ).localCheckpoint()
    return _decode_roundtrip_view(d, win, vocab)


# the store-read inversion must restore exactly what the in-plan
# inversion restores — one oracle, two execution paths
ORACLES["windows_store_decode_roundtrip"] = ORACLES["windows_decode_roundtrip"]


@query(
    "tokenizer_coverage_by_lang",
    oracle=_bpe_sql(
        _BPE_N,
        f"""
    , kept AS (
      SELECT * FROM w{_BPE_N} ORDER BY cnt DESC, word LIMIT {_BPE_OOV_KEEP}),
    dwl AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                x -> x <> '')) AS word
      FROM documents),
    per AS (
      SELECT d.lang,
             k.word IS NOT NULL AS covered,
             coalesce(len(k.s), len(d.word) + 1) AS toks,
             CASE WHEN k.word IS NULL THEN len(d.word) + 1 ELSE 0 END AS btoks
      FROM dwl d LEFT JOIN kept k ON k.word = d.word)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(count(*) FILTER (WHERE NOT covered) AS BIGINT) AS n_oov_words,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           CAST(sum(btoks) AS BIGINT) AS n_byte_tokens,
           round(count(*) FILTER (WHERE NOT covered) / CAST(count(*) AS DOUBLE),
                 6) AS oov_word_share,
           round(sum(btoks) / CAST(sum(toks) AS DOUBLE), 6)
             AS byte_token_share
    FROM per GROUP BY lang
    """,
    ),
)
def tokenizer_coverage_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROZEN-ARTIFACT coverage per language: what fraction of each
    language's word instances the capped word table covers, and what
    fraction of its token budget degrades to byte-fallback tokens —
    the audit a pipeline reads before shipping a tokenizer for a new
    corpus mix (`tokenizer_fertility_by_lang` answers "how well does it
    compress"; this answers "how often does it degrade", the other half
    of the frozen-vocabulary decision).  A language trending up in
    byte_token_share is drifting out of the trained vocabulary — the
    signal to retrain before sequence lengths silently inflate
    (byte-fallback spends ~5× the tokens of a covered word).

    Counting never builds token streams (the `bpe_token_profile`
    discipline): per word instance, a covered word costs its segment
    count and an OOV word costs ``len(word)+1`` byte tokens (normalized
    words are ASCII, so chars = UTF-8 bytes — the same arithmetic the
    certified OOV oracle replays).  Scale shape: one map-only explode,
    one broadcast join against the CAPPED (vocab_size-bounded) word
    table, and a partial-aggregated group-by emitting |languages| rows —
    no token-id assembly, no array shuffle, the cheapest possible pass
    over a 100 TB corpus."""
    from cassandra_util_spark.operators.bpe import bpe_train
    from cassandra_util_spark.operators.text import _norm_tokens

    d = _t(spark, sf_dir, "documents")
    _, words = bpe_train(d, "text", num_merges=_BPE_N)
    kept = words.orderBy(F.col("cnt").desc(), "word").limit(_BPE_OOV_KEEP)
    kc = kept.select("word", F.size("syms").alias("__nseg"))
    dw = d.select(
        "lang", F.explode(_norm_tokens(F.col("text"))).alias("word")
    )
    j = dw.join(F.broadcast(kc), "word", "left").select(
        "lang",
        F.col("__nseg").isNotNull().alias("__covered"),
        F.coalesce(
            F.col("__nseg"), F.length("word") + F.lit(1)
        ).alias("__toks"),
        F.when(F.col("__nseg").isNotNull(), F.lit(0))
        .otherwise(F.length("word") + F.lit(1))
        .alias("__btoks"),
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.when(~F.col("__covered"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov_words"),
        F.sum("__toks").cast("bigint").alias("n_tokens"),
        F.sum("__btoks").cast("bigint").alias("n_byte_tokens"),
        F.round(
            F.sum(F.when(~F.col("__covered"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("oov_word_share"),
        F.round(
            F.sum("__btoks") / F.sum("__toks").cast("double"), 6
        ).alias("byte_token_share"),
    )


# Random-access lookup oracle: the SAME window/token arithmetic as
# _WINDECODE_ORACLE (one builder — _windecode_sql), with the final
# projection restricted to the looked-up doc-id range [2·max/5,
# 9·max/20] — inside the middle ingest batch, so the engine side's
# key-bounded store read actually prunes runs.
_WINLOOKUP_ORACLE = _bpe_sql(
    _BPE_N,
    _windecode_sql(
        extra_cte=""",
    mxd AS (SELECT max(doc_id) AS m FROM documents)""",
        from_extra=", mxd",
        where="WHERE doc.doc_id >= (2 * mxd.m) // 5 "
              "AND doc.doc_id <= (9 * mxd.m) // 20",
    )
    + "\n    ",
)


@query("windows_doc_lookup", oracle=_WINLOOKUP_ORACLE)
def windows_doc_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANDOM ACCESS into the persisted window store: restore the
    training context of a REQUESTED doc-id range without scanning the
    store — the "trace these documents" production path
    (`windows_store_decode_roundtrip` proves the full-store inversion;
    this proves the engine can do it for a slice at slice cost).  The
    spans-derived doc→bin index gives the wanted docs' window range
    (one bounded aggregate); the store read is KEY-BOUNDED to those
    bins, so `read_merged` skips non-overlapping runs entirely via
    their stats and pushes the bin bounds into the surviving scans —
    the literal-IN/range pruning pattern of `sources/ivf_index.py`
    applied to the window store (on a 100 TB store with thousands of
    runs, a lookup reads only the handful holding the requested bins;
    the fixture's range sits inside the middle of three ingest batches,
    so pruning is real even here).  Spans are filtered to the wanted
    docs BEFORE reassembly — an out-of-range doc sharing a boundary
    window would otherwise reassemble from partial pieces, and its torn
    byte runs would (correctly) trip the decode guard.  The restored
    text must equal the normalized source exactly; the oracle replays
    the global window arithmetic and restricts to the same range."""
    d, _, vocab, enc = _oov_frozen(spark, sf_dir)
    # one max(doc_id) aggregate serves both the shard split and the
    # lookup range (review r17: the split helper used to recompute it)
    mx = int(enc.agg(F.max("doc_id").alias("m")).first()["m"])
    store = _drain_windows_store(
        spark, _ascending_id_shards(enc, mx=mx), "doc_id", capacity=1024,
        prefix="win-look",
    )
    lo_d, hi_d = (2 * mx) // 5, (9 * mx) // 20
    # the doc→bin index: derived from the store's attribution spans (at
    # production scale this is the persisted index artifact; its build
    # is one spans-only pass — token arrays pruned out of the read)
    index = (
        store.read_merged(spark)
        .select(F.explode("doc_spans").alias("s"), "bin")
        .filter(
            (F.col("s")["doc"] >= lo_d) & (F.col("s")["doc"] <= hi_d)
        )
        .agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"))
        .first()
    )
    if index["lo"] is None:
        # every doc in the range packed to zero tokens: no spans, no
        # bins to read — hand the view an empty window set so the
        # wanted docs render (0, 0, '') exactly as the oracle does,
        # instead of crashing on int(None) (review r17)
        win = store.read_merged(spark).select(
            "bin", "token_ids", "doc_spans"
        ).limit(0)
    else:
        lo_b, hi_b = int(index["lo"]), int(index["hi"])
        win = (
            store.read_merged(spark, key_lower=lo_b, key_upper=hi_b)
            .select(
                "bin",
                "token_ids",
                F.filter(
                    "doc_spans",
                    lambda s: (s["doc"] >= F.lit(lo_d))
                    & (s["doc"] <= F.lit(hi_d)),
                ).alias("doc_spans"),
            )
            .localCheckpoint()
        )
    wanted = d.filter((F.col("doc_id") >= lo_d) & (F.col("doc_id") <= hi_d))
    return _decode_roundtrip_view(wanted, win, vocab)


@query(
    "tokenizer_coverage_drift",
    oracle=_bpe_sql(
        _BPE_N,
        _BPE_OOV_CTES
        + """
    , per AS (
      SELECT d.doc_id, CAST(sum(len(s.ids)) AS BIGINT) AS n,
             CAST(sum(len(list_filter(s.ids, t -> t >= p.byte_base)))
               AS BIGINT) AS b
      FROM dw d JOIN allseg s USING (word) CROSS JOIN params p
      GROUP BY d.doc_id),
    mxd AS (SELECT max(doc_id) AS m FROM documents),
    labeled AS (
      SELECT CASE WHEN doc.doc_id <= mxd.m // 3 THEN 0
                  WHEN doc.doc_id <= (2 * mxd.m) // 3 THEN 1
                  ELSE 2 END AS batch,
             coalesce(per.n, 0) AS n, coalesce(per.b, 0) AS b
      FROM documents doc LEFT JOIN per USING (doc_id), mxd)
    SELECT CAST(batch AS BIGINT) AS batch,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(b) AS BIGINT) AS n_byte_tokens,
           round(sum(b) / CAST(greatest(sum(n), 1) AS DOUBLE), 6)
             AS byte_token_share
    FROM labeled GROUP BY batch
    """,
    ),
)
def tokenizer_coverage_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage drift PER INGEST BATCH, read off the persisted encode
    store: each `stream_encode` micro-batch stamps its rows with its
    batch id as the writetime, so the store itself carries the
    time-axis the drift monitor needs — byte-token share per ingest
    wave, no side channel, no re-encode (`tokenizer_coverage_by_lang`
    is the one-shot per-language audit; this is its streaming
    time-series twin, the dashboard a 100 TB ingest actually watches:
    the r17 ramp showed exactly this share drifting 0.199 → 0.954 as a
    corpus outgrew its frozen cap — SCALING.md).  The batch → doc-range
    mapping is deterministic by the append-order pin (ascending file
    mtimes, one file per trigger — `_pinned_shard_src`, the carry
    protocol's own mechanism), which is what makes the store's
    writetime column SQL-replayable.  Scale shape: one metadata-light
    aggregate over the store (token arrays feed one map-side
    size/filter pass; the group-by emits |batches| rows)."""
    from cassandra_util_spark.operators.bpe import byte_block_bounds

    d, kept, vocab = _oov_capped(spark, sf_dir)
    byte_base, _end = byte_block_bounds(vocab)
    src = _pinned_shard_src(
        _ascending_id_shards(d.select("doc_id", "text")),
        ["doc_id", "text"],
        "cov-drift",
    )
    store = _drain_encode_store(spark, src, kept, vocab, "cov-drift")
    # the byte-token count is STAGED as a column before the aggregate:
    # HOF lambdas are CodegenFallback and CSE never merges them, so an
    # inlined second copy inside byte_token_share would filter every
    # token array twice (review r17; the per-lang twin stages the same
    # way)
    staged = store.read_merged(spark).select(
        F.col("writetime").cast("bigint").alias("batch"),
        "n_tokens",
        F.size(
            F.filter("token_ids", lambda t: t >= F.lit(byte_base))
        ).alias("__btoks"),
    )
    return staged.groupBy("batch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("__btoks").cast("bigint").alias("n_byte_tokens"),
        F.round(
            F.sum("__btoks")
            / F.greatest(F.sum("n_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("byte_token_share"),
    )
