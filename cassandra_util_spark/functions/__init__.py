"""Scalar helpers shared by operators and entry queries."""

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth multiplicative hash — a "token" computable identically in any ANSI SQL
# engine (unlike xxhash64/murmur).  Used where an external oracle must agree
# on the token; OddTokenDeleter uses xxhash64 for realistic dispersion.
_KNUTH = 2654435761
_2_32 = 4294967296


def portable_token(col: Column) -> Column:
    """64-bit-safe multiplicative hash token of a bigint key, in [0, 2^32)."""
    return F.pmod(col.cast("bigint") * F.lit(_KNUTH), F.lit(_2_32))


def writetime_micros(ts_col: Column) -> Column:
    """Event-time timestamp → writetime microseconds (the reference's cell
    timestamp unit; CQLTimestamp.scala:17-40)."""
    return F.unix_micros(ts_col)


def age_seconds(writetime_col: Column, now_ms: int) -> Column:
    """Record age in whole seconds at a pinned run clock
    (RuleBasedLateTTLConvictor.java:644-648; floor division)."""
    wt_ms = F.floor(writetime_col / F.lit(1000))
    return F.floor((F.lit(int(now_ms)) - wt_ms) / F.lit(1000))
