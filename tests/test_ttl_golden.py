"""Golden TTL scenarios ported row-for-row from the reference's
RuleBasedLateTTLConvictorSpec.scala, with the run clock pinned for
determinism (fixedTtlBaseTime)."""

import pytest

from cassandra_util_spark.operators.convictors import RuleBasedLateTTLConvictor
from cassandra_util_spark.operators.retention import RetentionJob

NOW_MS = 1_700_000_000_000


def aged(seconds):
    """writetime microseconds for a record `seconds` old at NOW_MS
    (spec: System.currentTimeMillis*1000 - s*1_000_000)."""
    return NOW_MS * 1000 - seconds * 1_000_000


def surviving(table, rules_frame, default_ttl=None):
    convictor = RuleBasedLateTTLConvictor(
        table, rules=rules_frame, default_ttl=default_ttl, now_ms=NOW_MS
    )
    stats = RetentionJob(table, convictor).run()
    assert not stats.spooked, stats.warnings
    return stats.kept


def test_rules_based_default_ttl(tenanted, rules_df):
    # RuleBasedLateTTLConvictorSpec.scala:42-78 — default_ttl=300; 4 -> 2
    table = tenanted(
        [
            (1785, "00000151ef35589ff90c54401aae08f5", aged(600)),
            (1785, "0000015201153acb407978edcb28b452", aged(30)),
            (1791, "00000151eb66fc0c2ffc298022a0e221", aged(600)),
            (1791, "00000151f82053a2846086bd220a3abb", aged(30)),
        ],
        with_writetime=True,
    )
    rules = rules_df([("full_ttl", "tenant", ("1785", "1785"), 300)], with_ttl=True)
    assert surviving(table, rules, default_ttl=300) == 2


def test_rule_with_multiple_agents(tenanted, rules_df):
    # :96-132 — per-tenant ttl=300, future write kept; 17 -> 6
    table = tenanted(
        [
            (1726, "00000151e518481a3b3e6939bc9493da", aged(600)),
            (1726, "00000151f43248180be67107251b6167", aged(600)),
            (1726, "00000151f84bd381fc78aca5e26567c0", aged(600)),
            (1726, "00000151fc18df688b31da3f0215d55f", aged(600)),
            (1742, "00000151cb75b17f7f53f2187da68102", aged(100)),
            (1742, "00000151cbb68f50d0833f75269cef4d", aged(600)),
            (1742, "00000151ce5d691144119389cabb2b6f", aged(600)),
            (1742, "00000151db1fdba2a888063457159d3e", aged(-300)),
            (1742, "00000151dd6975e92eba7cdd4e4ecc12", aged(600)),
            (1742, "00000151f1470429cdf31d0485bb99e8", aged(600)),
            (1742, "00000151f4f221b20df147d1c14691b0", aged(600)),
            (1742, "00000151f7dabc8c37a47b98d3533552", aged(600)),
            (1753, "00000151d2b65a18a3aa7058aa6a2116", aged(600)),
            (1753, "00000151f4da90041129071c9c9da7eb", aged(30)),
            (1768, "00000151e1f2e6c5eb875453555c4e2e", aged(0)),
            (1768, "00000151ffe7cc5df88bb70614edbbf0", aged(10000)),
            (1771, "000001520af1e48e75c67e3c82791880", aged(6000)),
        ],
        with_writetime=True,
    )
    rules = rules_df(
        [
            ("sid_1726", "tenant", ("1726", "1726"), 300),
            ("sid_1742", "tenant", ("1742", "1742"), 300),
            ("sid_1771", "tenant", ("1771", "1771"), 300),
        ],
        with_ttl=True,
    )
    assert surviving(table, rules) == 6


def test_ttl_id_range(tenanted, rules_df):
    # :134-163 — AND rule (tenant + id); 11 -> 9
    table = tenanted(
        [
            (1782, "00000151d54828e1775e4d044a7b5766", aged(600)),
            (1782, "00000151d587110b4d1a728565d72e30", aged(30)),
            (1782, "00000151d776e879a4ada06c8c839ef3", aged(600)),
            (1782, "00000151d9b90a33317258fef4bc49ed", aged(0)),
            (1782, "00000151e25f060b49a8d79e897ab369", aged(0)),
            (1782, "00000151e35ae631557c517014f885e1", aged(0)),
            (1782, "00000151f08b0fc345cf5826903200cf", aged(0)),
            (1782, "00000151f44306fcb6cadc71aaa3f372", aged(0)),
            (1782, "00000151f9f0b9f98c5c9c616e4e3468", aged(0)),
            (1782, "0000015203cb65b5c4a181d4222f7577", aged(0)),
            (1782, "000001520a7fda1500bdf3318ef4ec95", aged(0)),
        ],
        with_writetime=True,
    )
    rules = rules_df(
        [
            ("cid_2", "tenant", ("1782", "1782"), 300),
            ("cid_2", "id", (None, "00000151d80000000000000000000000"), 300),
        ],
        with_ttl=True,
    )
    assert surviving(table, rules) == 9


def test_ttl_cid_range(tenanted, rules_df):
    # :165-186 — tenant range 1783-1786; 4 -> 3
    table = tenanted(
        [
            (1785, "00000151ef35589ff90c54401aae08f5", aged(600)),
            (1785, "0000015201153acb407978edcb28b452", aged(30)),
            (1791, "00000151eb66fc0c2ffc298022a0e221", aged(600)),
            (1791, "00000151f82053a2846086bd220a3abb", aged(30)),
        ],
        with_writetime=True,
    )
    rules = rules_df([("cid_3", "tenant", ("1783", "1786"), 300)], with_ttl=True)
    assert surviving(table, rules) == 3


def test_full_scan_ttl(tenanted, rules_df):
    # :188-209 — rule (null, null) applies to every row; 4 -> 2
    table = tenanted(
        [
            (1785, "00000151ef35589ff90c54401aae08f5", aged(600)),
            (1785, "0000015201153acb407978edcb28b452", aged(30)),
            (1791, "00000151eb66fc0c2ffc298022a0e221", aged(600)),
            (1791, "00000151f82053a2846086bd220a3abb", aged(30)),
        ],
        with_writetime=True,
    )
    rules = rules_df([("full_ttl", "tenant", (None, None), 300)], with_ttl=True)
    assert surviving(table, rules) == 2


def test_ttl_shortened_id_range(tenanted, rules_df):
    # :211-234 — 6 -> 4
    table = tenanted(
        [
            (1808, "000001500d6e500520483cb290acf7c4", aged(600)),
            (1824, "00000150cbb694020320975300cc349c", aged(30)),
            (1824, "00000150d92640fbc244d1670884f022", aged(600)),
            (1824, "00000150e4d7b9bb0675764d10c0db0c", aged(30)),
            (1824, "00000150e5984a8b2444310df745223c", aged(600)),
            (1824, "00000150f89554064a02d4c7e86c58d3", aged(30)),
        ],
        with_writetime=True,
    )
    rules = rules_df([("cid_4", "id", ("", "00000150e0000000"), 300)], with_ttl=True)
    assert surviving(table, rules) == 4


def test_ttl_full_miss(tenanted, rules_df):
    # :236-255 — no rules, no default: keep all; 5 -> 5
    table = tenanted(
        [
            (1879, "00000151ef32e8298ab774b3b950b97c", aged(600)),
            (1883, "000001520d86a1830e6c40b6308c8aac", aged(30)),
            (1884, "00000151df3e1efe7387e82c7c3d22a7", aged(300)),
            (1885, "00000151e82201a09bcd632a95ca8d2d", aged(3000)),
            (1887, "00000151cb6c15d4cdceca118f9cbef1", aged(30000)),
        ],
        with_writetime=True,
    )
    rules = rules_df([], with_ttl=True).limit(0)
    assert surviving(table, rules) == 5


def test_ttl_internal_range(tenanted, rules_df):
    # :257-279 — 5 -> 4
    table = tenanted(
        [
            (1842, "00000151d923f0936f0f4b31e55a970d", aged(600)),
            (1842, "00000151f641b42540fe0258023693c8", aged(600)),
            (1842, "00000152095ac91e0809ce0a2419304c", aged(600)),
            (1842, "0000015209f75d0b86cb5717484ce0ea", aged(30)),
            (1842, "000001520a0a63fbb0582435ae3efa5d", aged(600)),
        ],
        with_writetime=True,
    )
    rules = rules_df([("cid_6", "id", ("00000151ff", "000001520a"), 300)], with_ttl=True)
    assert surviving(table, rules) == 4


def test_ttl_zero_immediate(tenanted, rules_df):
    # :281-305 — ttl=0 deletes any positive age; 7 -> 6
    table = tenanted(
        [
            (1827, "000151d4e6fec2fde7240e6c5e1fce00", aged(600)),
            (1827, "00000151e992ed8adb38cfbc2e6c0c52", aged(600)),
            (1827, "00000151f6cde9e92ea68f051f6d96b5", aged(600)),
            (1838, "00000151fb731fff3aae3a1236a90551", aged(600)),
            (1866, "00000151e560cec31329cd7cdc4ad37e", aged(600)),
            (1866, "00000151f9cc533b6347f86571e34eda", aged(600)),
            (1866, "0000015203ddcf3d1598b05a8f5f1c2f", aged(600)),
        ],
        with_writetime=True,
    )
    rules = rules_df([("cid_7", "id", ("00001f", None), 0)], with_ttl=True)
    assert surviving(table, rules) == 6


def test_overlapping_snapshots_dedup(tenanted, rules_df):
    # :307-335 — the same rows flushed twice (two sorted runs); last-write-wins
    # merge then retention; 2 distinct keys -> 1 survivor
    rows = [
        (1827, "000151d4e6fec2fde7240e6c5e1fce00", aged(600)),
        (1827, "00000151e992ed8adb38cfbc2e6c0c52", aged(600)),
    ]
    run1 = tenanted(rows, with_writetime=True)
    run2 = tenanted(rows, with_writetime=True)
    merged_table = run1.with_df(run1.df.union(run2.df))
    merged = merged_table.with_df(merged_table.merged())
    assert merged.df.count() == 2  # dedup collapsed the duplicate run
    rules = rules_df([("cid_7", "id", ("00001f", None), 0)], with_ttl=True)
    assert surviving(merged, rules) == 1


def test_keep_forever_negative_ttl(tenanted, rules_df):
    # sub-zero TTL means keep forever and overrides broader rules because
    # min() picks it (RuleBasedLateTTLConvictor.java:633-645)
    table = tenanted(
        [(1726, "aa", aged(600)), (1726, "bb", aged(600)), (1727, "cc", aged(600))],
        with_writetime=True,
    )
    rules = rules_df(
        [
            ("broad", "tenant", ("1726", "1727"), 300),
            ("save_aa", "id", ("aa", "aa"), -1),
        ],
        with_ttl=True,
    )
    # 'aa' matches both rules; min(300, -1) = -1 => keep forever
    assert surviving(table, rules) == 1


def test_ttl_inconsistent_spooks(tenanted, rules_df):
    table = tenanted([(1, "x", aged(600))], with_writetime=True)
    rules = rules_df(
        [("r", "tenant", ("1", "1"), 300), ("r", "id", (None, None), 200)],
        with_ttl=True,
    )
    convictor = RuleBasedLateTTLConvictor(table, rules=rules, now_ms=NOW_MS)
    assert convictor.spooked


def test_ttl_rules_via_select_statement(spark, tenanted, rules_df):
    """rules_select works for the TTL convictor too (with_ttl plumbed)."""
    table = tenanted(
        [(1726, "aa", aged(400)), (1726, "bb", aged(100)), (1750, "cc", aged(400))],
        with_writetime=True,
    )
    rules_df(
        [("r1726", "tenant", ("1726", "1726"), 300)], with_ttl=True
    ).createOrReplaceTempView("ttl_rules_view")
    convictor = RuleBasedLateTTLConvictor(
        table,
        rules_select="SELECT rulename, column, range, ttl FROM ttl_rules_view",
        now_ms=NOW_MS,
    )
    stats = RetentionJob(table, convictor).run()
    assert not stats.spooked, stats.warnings
    # aa: matched, age 400 > ttl 300 -> convicted; bb young; cc unmatched, no default
    assert (stats.kept, stats.convicted) == (2, 1)
