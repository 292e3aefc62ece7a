"""Pure-logic tests for scripts/plan_audit.py's --merge splice helpers
(ADVICE r9/r10): the row-insertion anchor must not land between the table
header and its separator when the table has zero data rows (the header
line matches the data-row regex), and detail blocks containing regex
template metacharacters (backslashes from pushed-filter string literals)
must be spliced verbatim, not interpreted as a replacement template."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)

HEADER = "| query | shuffles | bhj | smj | pushed | codegen |"
SEP = "|---|---|---|---|---|---|"


def test_anchor_empty_table_is_separator_not_header():
    lines = ["# PLANS", "", HEADER, SEP, "", "notes"]
    i = plan_audit.merge_anchor(lines)
    assert lines[i] == SEP  # inserting at i+1 lands after the separator


def test_anchor_is_last_data_row():
    lines = [HEADER, SEP, "| q_one | 0 | 1 | 0 | 1 | 2 |",
             "| q_two | 2 | 0 | 1 | 0 | 3 |", "", "### q_one"]
    assert plan_audit.merge_anchor(lines) == 3


def test_anchor_no_table():
    assert plan_audit.merge_anchor(["# PLANS", "", "prose only"]) == -1


def test_anchor_stops_at_first_table_even_with_later_tables():
    """ADVICE r11: if PLANS.md ever gains a SECOND table (a detail or
    appendix section), the anchor must stay inside the summary table —
    the old scan anchored on the last data-row-shaped line anywhere in
    the file and would splice new rows into the appendix."""
    lines = [HEADER, SEP, "| q_one | 0 | 1 | 0 | 1 | 2 |", "",
             "## appendix", "| col | note |", "|---|---|",
             "| appendix_row | x |"]
    assert plan_audit.merge_anchor(lines) == 2  # q_one, not appendix_row


def test_anchor_empty_table_with_later_table():
    lines = [HEADER, SEP, "", "## appendix", "| col | note |", "|---|---|",
             "| appendix_row | x |"]
    i = plan_audit.merge_anchor(lines)
    assert lines[i] == SEP


def test_insert_into_empty_table_keeps_structure():
    lines = [HEADER, SEP, ""]
    i = plan_audit.merge_anchor(lines)
    lines.insert(i + 1, "| q_new | 0 | 0 | 0 | 1 | 1 |")
    assert lines == [HEADER, SEP, "| q_new | 0 | 0 | 0 | 1 | 1 |", ""]


def test_splice_detail_literal_backslashes():
    text = "intro\n\n### q_one\n- `PushedFilters: [old]`\n\ntail\n"
    block = "### q_one\n- `StringContains(path,C:\\data\\5)`"
    out = plan_audit.splice_detail(text, "q_one", block)
    assert "C:\\data\\5" in out  # \5 would raise/corrupt as a template
    assert "old" not in out
    assert out.count("### q_one") == 1
    assert "tail" in out


def test_splice_detail_appends_when_missing():
    out = plan_audit.splice_detail("intro\n", "q_new", "### q_new\n- `x`")
    assert out.endswith("### q_new\n- `x`\n")


def test_repeated_subtree_pure_logic():
    """Exact-duplicate ≥min_count expensive subtrees flag; distinct trees
    and cheap attribute reads never do."""
    tree = ("transform(sequence(0, 9), lambdafunction(conv(substring(md5("
            "concat(seed, lambda x_1#5)), 1, 8), 16, 10), lambda x_1#5, false))")
    line = "Project [" + ", ".join(f"element_at({tree}, {i})" for i in range(4)) + "]"
    flags = plan_audit.repeated_subtrees(line, min_len=40, min_count=3)
    assert flags and flags[0][1] == 4
    # maximal subtree only: the inner md5 repeat is the same finding
    assert all("transform(" in s for s, _ in flags)
    distinct = "Project [" + ", ".join(
        f"transform(seq, lambdafunction(md5(concat(seed{i}, lambda x_1#5)), lambda x_1#5, false))"
        for i in range(4)
    ) + "]"
    assert plan_audit.repeated_subtrees(distinct, min_len=40, min_count=3) == []
    # a repeated PLAIN deterministic tree is CSE territory, not a flag
    plain = "Project [" + ", ".join(
        "conv(substring(md5(concat(seed, id)), 1, 8), 16, 10)" for _ in range(4)
    ) + "]"
    assert plan_audit.repeated_subtrees(plain, min_len=40, min_count=3) == []
    cheap = "Project [" + ", ".join("cast(doc_id as bigint)" for _ in range(9)) + "]"
    assert plan_audit.repeated_subtrees(cheap, min_len=10, min_count=3) == []


def test_repeated_subtree_regression_fixture(spark):
    """The PRE-staging `span_corruption_pairs` shape (VERDICT r14 task 3):
    a k-hash span table re-inlined at every element_at must flag; the
    staged (withColumn) form — the committed fix — must not."""
    from pyspark.sql import functions as F

    from cassandra_util_spark.functions import portable_hash32

    df = spark.createDataFrame(
        [(1, list(range(40))), (2, list(range(25)))],
        "doc_id int, ids array<int>",
    )
    k = F.lit(4)

    def span(i):
        w = portable_hash32(
            F.concat(F.lit("s:"), F.col("doc_id").cast("string"),
                     F.lit(":"), i.cast("string"))
        )
        return F.struct(
            F.pmod(w, F.lit(10)).cast("int").alias("start"),
            (F.lit(1) + F.pmod(w, F.lit(3))).cast("int").alias("len"),
        )

    table = F.transform(F.sequence(F.lit(0), k - 1), span)

    def stitched(spans):
        return F.flatten(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.slice(
                    F.col("ids"),
                    F.element_at(spans, i + 1)["start"] + 1,
                    F.element_at(spans, i + 1)["len"],
                ),
            )
        )

    prefix = df.select("doc_id", stitched(table).alias("out"))
    plan = prefix._jdf.queryExecution().executedPlan().toString()
    assert plan_audit.repeated_subtrees(plan), (
        "the unstaged span table must flag (it re-evaluates the hash "
        "construction at every element_at)"
    )

    staged = df.withColumn("__spans", table)
    fixed = staged.select(
        "doc_id", stitched(F.col("__spans")).alias("out")
    )
    fplan = fixed._jdf.queryExecution().executedPlan().toString()
    assert plan_audit.repeated_subtrees(fplan) == [], (
        "the staged form is the committed fix and must pass"
    )


def test_let_bind_values_and_single_evaluation(spark):
    """functions.let_bind: identical values to the unbound expression, and
    the bound tree appears ONCE in the plan however many times the body
    references it."""
    from pyspark.sql import functions as F

    from cassandra_util_spark.functions import let_bind

    df = spark.createDataFrame([("a b c a",), ("",)], "text string")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    bound = let_bind(toks, lambda ts: F.size(ts) * 100 + F.size(ts))
    unbound = F.size(toks) * 100 + F.size(toks)
    rows = df.select(bound.alias("b"), unbound.alias("u")).collect()
    assert all(r["b"] == r["u"] for r in rows)
    plan = (
        df.select(bound.alias("b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("split(") == 1
