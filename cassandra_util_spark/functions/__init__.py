"""Scalar helpers shared by operators and entry queries."""

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth multiplicative hash — a "token" computable identically in any ANSI SQL
# engine (unlike xxhash64/murmur).  Used where an external oracle must agree
# on the token; OddTokenDeleter uses xxhash64 for realistic dispersion.
_KNUTH = 2654435761
_2_32 = 4294967296


def portable_token(col: Column) -> Column:
    """Multiplicative hash token of a bigint key, in [0, 2^32) — overflow-
    free for EVERY bigint key.

    The naive ``pmod(k * K, 2^32)`` overflows signed-64 once |k| exceeds
    ~3.47e9 (ANSI mode raises ARITHMETIC_OVERFLOW — found by the x10
    scale ramp, where replica ids sit at k·1e9 offsets; real snowflake-style
    ids live there too).  Computed instead as a 16-bit-limb modular
    multiply: with m = pmod(k, 2^32) split into hi·2^16 + lo, the result is
    ``pmod(pmod(hi·K, 2^32)·2^16 + lo·K, 2^32)`` — every intermediate is
    < 2^49, and the value is IDENTICAL to (k·K) mod 2^32 in exact
    arithmetic, so existing oracles (``(key * 2654435761) % 4294967296``
    on small keys) are unchanged."""
    m = F.pmod(col.cast("bigint"), F.lit(_2_32))
    hi = F.floor(m / F.lit(65536)).cast("bigint")
    lo = m - hi * F.lit(65536)
    return F.pmod(
        F.pmod(hi * F.lit(_KNUTH), F.lit(_2_32)) * F.lit(65536) + lo * F.lit(_KNUTH),
        F.lit(_2_32),
    )


def let_bind(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE per row
    and reference it k times inside ``body(var)`` — ``transform`` over a
    single-element array is the expression language's only
    variable-binding construct, and its lambda variable is a plain
    attribute read at evaluation time.

    This is the staging remedy (SCALING.md r14 span-staging note;
    `plan_audit.repeated_subtrees` is the standing guard) for COLUMN-level
    helpers, where ``withColumn`` is not available: a non-cheap tree
    referenced k times in one expression — especially inside
    higher-order-function lambdas, which are CodegenFallback and never
    reached by subexpression elimination — is k evaluations per row
    without it.  Values are unchanged: the wrapper is
    ``element_at(transform(array(value), body), 1)``."""
    return F.element_at(F.transform(F.array(value), body), 1)


def portable_hash32(col: Column, offset: int = 1) -> Column:
    """32-bit portable string hash: 8 hex chars of md5 starting at ``offset``
    (1-based), as a non-negative bigint.  md5 renders identically in every
    engine, so an external oracle can reproduce the value exactly — unlike
    xxhash64/murmur whose seeds and mixing are engine-specific.  Offsets 1
    and 9 give two independent 32-bit words from one md5."""
    return F.conv(F.substring(F.md5(col), offset, 8), 16, 10).cast("bigint")


def portable_hash31(col: Column) -> Column:
    """31-bit portable string hash (the top md5 word masked to 31 bits) —
    fits the Mersenne-field universal-hashing arithmetic used by MinHash."""
    return portable_hash32(col).bitwiseAND(F.lit(0x7FFFFFFF))


def portable_hash32_sql(expr: str, offset: int = 1) -> str:
    """DuckDB SQL computing exactly :func:`portable_hash32`."""
    return f"CAST(('0x' || substring(md5({expr}), {offset}, 8)) AS BIGINT)"


def portable_hash31_sql(expr: str) -> str:
    """DuckDB SQL computing exactly :func:`portable_hash31`."""
    return f"({portable_hash32_sql(expr)} & 2147483647)"


def writetime_micros(ts_col: Column) -> Column:
    """Event-time timestamp → writetime microseconds (the reference's cell
    timestamp unit; CQLTimestamp.scala:17-40).

    NTZ-safe: ``unix_micros`` rejects TIMESTAMP_NTZ (how Spark 4 reads the
    parquet TIMESTAMP(NANOS) event time), so cast through TIMESTAMP first.
    The cast is a no-op for TIMESTAMP inputs and interprets NTZ wall-clock in
    the session timezone — the engine pins that to UTC (see
    :func:`normalize_event_time`), which matches the reference's timezone-free
    epoch-µs writetime semantics.

    Input must be TIMESTAMP or TIMESTAMP_NTZ.  A raw int64-nanos column must
    go through :func:`normalize_event_time` FIRST (it is DataFrame-level and
    type-aware; a Column cannot introspect its own type): casting a bigint
    here is interpreted as epoch-SECONDS and mis-scales by 1e9 — SILENTLY,
    even under ANSI mode (measured on Spark 4.1.2: the numeric→timestamp
    cast is permitted and saturates rather than erroring), so this function
    cannot defend itself against numeric input.  Callers with raw columns
    use :func:`derive_writetime`, which introspects the DataFrame type and
    never routes a numeric column through a timestamp cast.
    """
    return F.unix_micros(ts_col.cast("timestamp"))


def derive_writetime(df, col: str = "ts", out_col: str = "writetime"):
    """DataFrame-level writetime derivation — the type-introspecting
    companion to :func:`writetime_micros` (a Column cannot see its own type;
    a DataFrame can).  Safe on every physical representation in
    :data:`EVENT_TIME_TYPES`: raw int64 NANOS divide straight to µs without
    ever passing through a timestamp cast (so the epoch-seconds
    mis-interpretation cannot occur, with or without ANSI mode), and
    timestamp/NTZ inputs take the :func:`writetime_micros` path (NTZ relies
    on the UTC session pin, as normalize_event_time documents).
    """
    dt = df.schema[col].dataType.simpleString()
    if dt == "bigint":
        return df.withColumn(out_col, F.expr(f"`{col}` div 1000"))
    if dt in ("timestamp", "timestamp_ntz"):
        return df.withColumn(out_col, writetime_micros(F.col(col)))
    raise TypeError(
        f"event-time column {col!r} has unexpected physical type {dt!r}; "
        f"expected one of {EVENT_TIME_TYPES}"
    )


#: Physical representations an event-time column may arrive in, depending on
#: Spark version and reader conf:
#:  - ``timestamp``      — Spark ≤3 read of TIMESTAMP(MICROS/MILLIS) parquet
#:  - ``timestamp_ntz``  — Spark 4 native read of TIMESTAMP(NANOS) parquet
#:                         (truncated to µs; isAdjustedToUTC=false ⇒ NTZ)
#:  - ``bigint``         — raw int64 nanos via spark.sql.legacy.parquet.nanosAsLong
EVENT_TIME_TYPES = ("timestamp", "timestamp_ntz", "bigint")


def normalize_event_time(df, col: str = "ts"):
    """Normalize an event-time column to canonical TIMESTAMP (epoch-µs).

    Handles all three physical representations in :data:`EVENT_TIME_TYPES`
    identically — the regression Spark 4.1.2 exposed was a single hard-coded
    assumption of the bigint-nanos representation.  Requires the session
    timezone to be UTC for the NTZ branch to be epoch-preserving (DuckDB's
    ``epoch_us`` treats the same wall-clock as UTC); callers that read driver
    parquet pin it (``entry_queries._t``).

    Raises a clear TypeError naming the unexpected physical type rather than
    letting a deep Catalyst AnalysisException surface later.
    """
    dt = df.schema[col].dataType.simpleString()
    if dt == "bigint":
        # int64 nanoseconds → µs timestamp (truncation, matching epoch_us)
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if dt == "timestamp_ntz":
        # wall-clock µs; UTC session tz makes this cast epoch-preserving
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if dt == "timestamp":
        return df
    raise TypeError(
        f"event-time column {col!r} has unexpected physical type {dt!r}; "
        f"expected one of {EVENT_TIME_TYPES} "
        "(did the parquet writer or a Spark upgrade change the representation?)"
    )


def age_seconds(writetime_col: Column, now_ms: int) -> Column:
    """Record age in whole seconds at a pinned run clock
    (RuleBasedLateTTLConvictor.java:644-648; floor division)."""
    wt_ms = F.floor(writetime_col / F.lit(1000))
    return F.floor((F.lit(int(now_ms)) - wt_ms) / F.lit(1000))
