"""Plan-health audit: for each contract query, record the physical-plan
properties that matter at 100 TB — did filters reach the parquet scan
(PushedFilters), did small sides broadcast, how many shuffles, how much of
the plan is whole-stage codegen.  Writes PLANS.md.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Expression roots worth staging when referenced repeatedly: hashes,
# regex/string surgery, and array/lambda constructions.  Cheap leaf reads
# (attributes, literals, casts) are exactly what CollapseProject SHOULD
# re-inline, so they are not candidates.
_EXPENSIVE_ROOTS = frozenset(
    {
        "md5", "sha1", "sha2", "crc32", "xxhash64", "hash", "conv",
        "regexp_replace", "regexp_extract", "regexp_extract_all", "split",
        "transform", "aggregate", "filter", "exists", "forall", "zip_with",
        "sequence", "array_sort", "sort_array", "flatten", "array_repeat",
        "json_tuple", "from_json", "get_json_object",
    }
)


def _balanced(line: str, start: int, cap: int = 4000) -> "str | None":
    """``name(...)`` substring starting at ``start`` with balanced parens
    (scan capped — plan lines can be megabytes; an unclosed/oversized
    subtree returns None and is simply not a candidate)."""
    i = line.index("(", start)
    depth = 0
    end = min(len(line), start + cap)
    for j in range(i, end):
        c = line[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return line[start : j + 1]
    return None


def repeated_subtrees(
    plan: str, min_len: int = 80, min_count: int = 3
) -> "list[tuple[str, int]]":
    """Non-cheap expression subtrees repeated verbatim ≥ ``min_count``
    times within ONE plan node line — the shape that cost
    `span_corruption_pairs` 4.2× at x30 before staging (VERDICT r14
    task 3 / SCALING.md r14 note): CollapseProject re-inlines a cheap
    ALIAS into each use, so an expensive tree referenced k times inside
    ``transform``/``filter`` lambdas or repeated projections is k
    evaluations per row.  The fix is always the same — stage the tree as
    a real column (``withColumn``) before the consuming projection;
    Catalyst keeps multi-referenced NON-cheap expressions staged
    (SPARK-36718).

    Lambda context is REQUIRED to flag: the subtree must contain a
    ``lambdafunction`` (it is/wraps a higher-order function) or reference
    a lambda variable (it sits inside an enclosing lambda body).  Spark's
    higher-order functions are CodegenFallback — subexpression
    elimination never reaches them — so these repeats are real per-row
    (or per-ELEMENT) re-evaluations.  A repeated PLAIN deterministic
    tree (an md5 chain projected three times, a regexp in three
    columns) is handled by whole-stage codegen's subexpression
    elimination at runtime and is deliberately NOT flagged.

    Returns maximal flagged subtrees as ``(subtree, count)``, most
    repeated first.  Subtrees are compared after stripping expression
    ids (``#12``) and JVM object addresses (``@1a2b``): each re-inlined
    copy of a lambda body gets FRESH lambda-variable ids, so the copies
    are id-renamings of one tree, never byte-identical.  Trees that
    differ in real content (different literals, different columns by
    NAME) still compare distinct — genuinely different work does not
    flag."""
    flags: dict[str, int] = {}
    for line in plan.split("\n"):
        if len(line) < min_len * min_count:
            continue
        counts: dict[str, int] = {}
        for m in re.finditer(r"\b([a-z_][a-z0-9_]*)\(", line):
            if m.group(1) not in _EXPENSIVE_ROOTS:
                continue
            sub = _balanced(line, m.start(1))
            if (
                sub is not None
                and len(sub) >= min_len
                and ("lambdafunction(" in sub or "lambda " in sub)
            ):
                key = re.sub(r"#\d+|@[0-9a-f]+", "", sub)
                counts[key] = counts.get(key, 0) + 1
        hits = [(s, c) for s, c in counts.items() if c >= min_count]
        # keep only MAXIMAL subtrees: an inner md5 repeated inside a
        # flagged outer transform is the same finding, not a second one
        for s, c in hits:
            if any(s != o and s in o for o, _ in hits):
                continue
            flags[s] = max(flags.get(s, 0), c)
    return sorted(flags.items(), key=lambda kv: -kv[1])


def merge_anchor(lines: list) -> int:
    """Index of the line after which missing table rows are inserted: the
    last data row, or the ``|---|`` separator when the table has none.

    The header line (`| query | shuffles | ...`) matches the data-row
    regex too, so data rows only count AFTER the separator — anchoring on
    the header would insert rows between header and separator and corrupt
    the table in exactly the empty-table edge case (ADVICE r9/r10).
    Scanning STOPS at the first non-table line after the separator
    (ADVICE r11): the anchor must stay inside the summary table, not
    latch onto a row of some later table (e.g. a detail or appendix
    section) and splice new rows into it.
    Returns -1 when no table exists at all."""
    sep_idx = None
    last_data = None
    for i, line in enumerate(lines):
        if sep_idx is None:
            if re.match(r"^\|---", line):
                sep_idx = i
        elif re.match(r"^\| [A-Za-z0-9_]+ \|", line):
            last_data = i
        else:
            break  # first non-data line after the separator ends the table
    if last_data is not None:
        return last_data
    return sep_idx if sep_idx is not None else -1


def splice_detail(text: str, name: str, block: str) -> str:
    """Replace the ``### name`` detail block in ``text`` with ``block`` (or
    append it).  Uses a callable replacement: the block carries
    plan-derived text (pushed-filter literals can contain backslashes)
    that must not be parsed as a regex replacement template (ADVICE r10)."""
    pat = re.compile(rf"^### {re.escape(name)}\n(?:- .*\n?)*", re.MULTILINE)
    if pat.search(text):
        return pat.sub(lambda m: block + "\n", text)
    return text.rstrip("\n") + "\n\n" + block + "\n"


def main() -> None:
    argv = list(sys.argv[1:])
    merge_only: list[str] = []
    if "--only" in argv:
        i = argv.index("--only")
        merge_only = argv[i + 1 :]
        argv = argv[:i]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.entry_queries import QUERIES

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    if merge_only:
        # incremental mode (the release-gate flow after registering a query):
        # audit just these queries and splice their rows into the committed
        # PLANS.md table, keeping one row per registered query
        unknown = [n for n in merge_only if n not in QUERIES]
        if unknown:
            raise SystemExit(f"--only names not registered: {unknown}")
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
        )
        with open(out) as f:
            content = f.read()
        rows = {}
        det = {}
        flagged: dict[str, list] = {}
        for name in merge_only:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            reps = repeated_subtrees(plan)
            if reps:
                flagged[name] = reps
            shuffles = plan.count("Exchange hashpartitioning") + plan.count(
                "Exchange rangepartitioning"
            ) + plan.count("Exchange SinglePartition")
            bhj = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
            smj = plan.count("SortMergeJoin") + plan.count("CartesianProduct")
            pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
            codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
            rows[name] = f"| {name} | {shuffles} | {bhj} | {smj} | {pushed} | {codegen} |"
            scans = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
            if scans:
                det[name] = f"### {name}\n" + "\n".join(
                    f"- `{sc[:180]}`" for sc in scans[:4]
                )
        new_lines = []
        present = set()
        for line in content.splitlines():
            m = re.match(r"^\| ([A-Za-z0-9_]+) \|", line)
            if m and m.group(1) in rows:
                new_lines.append(rows[m.group(1)])
                present.add(m.group(1))
            else:
                new_lines.append(line)
        # append rows for queries not yet in the table, right after the table
        missing = [n for n in merge_only if n not in present]
        if missing:
            last_row = merge_anchor(new_lines)
            if last_row < 0:
                raise SystemExit("plan_audit --only: PLANS.md has no table to merge into; run a full regen first")
            for j, n in enumerate(missing):
                new_lines.insert(last_row + 1 + j, rows[n])
        # refresh the per-query pushed-filter details for merged queries so
        # the details section no longer drifts until a full regen (ADVICE r9):
        # replace each existing `### name` block, append new ones at the end
        text = "\n".join(new_lines)
        for name, block in det.items():
            text = splice_detail(text, name, block)
        with open(out, "w") as f:
            f.write(text.rstrip("\n") + "\n")
        print(f"merged {len(rows)} plan row(s) + {len(det)} detail block(s) into {out}")
        spark.stop()
        if flagged:
            for name, reps in flagged.items():
                for sub, c in reps[:3]:
                    print(
                        f"REPEATED SUBTREE in {name}: ×{c}  {sub[:160]}",
                        file=sys.stderr,
                    )
            raise SystemExit(
                f"plan_audit: {len(flagged)} quer{'y' if len(flagged) == 1 else 'ies'} "
                "re-evaluate a non-cheap expression subtree ≥3 times in one "
                "node — stage it as a column (withColumn) before the "
                "consuming projection (see SCALING.md r14 span-staging note)"
            )
        return

    lines = [
        "# PLANS — physical-plan health of every contract query",
        "",
        f"Generated by `scripts/plan_audit.py` at `{sf_dir}`.  Checks: filters",
        "pushed into the parquet scan, broadcast joins for small sides, shuffle",
        "(Exchange) count, whole-stage-codegen coverage.",
        "",
        "Reading guide: retention/filter queries must be 0-shuffle with pushdown;",
        "joins should broadcast dimensions (no SortMergeJoin of a small side);",
        "single-agg queries should show exactly 1 shuffle.  A 0 in 'codegen",
        "stages' under a shuffle usually means the plan is adaptive",
        "(AdaptiveSparkPlan prints codegen markers only after execution).",
        "",
        "| query | shuffles | broadcast joins | SMJ/BNL joins | pushed filters | codegen stages |",
        "|---|---|---|---|---|---|",
    ]
    details: list[str] = []
    flagged: dict[str, list] = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        reps = repeated_subtrees(plan)
        if reps:
            flagged[name] = reps
        shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        ) + plan.count("Exchange SinglePartition")
        bhj = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
        smj = plan.count("SortMergeJoin")
        bnl = plan.count("CartesianProduct")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        lines.append(
            f"| {name} | {shuffles} | {bhj} | {smj + bnl} | {pushed} | {codegen} |"
        )
        scans = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        if scans:
            details.append(f"### {name}\n" + "\n".join(f"- `{s[:180]}`" for s in scans[:4]))

    # -- sketch advisory vs AQE cross-check (VERDICT r4 task 7) -------------
    # plan_join's advice is computed BEFORE execution from CM sketches; AQE
    # decides the physical join AT RUNTIME from observed sizes.  Running the
    # advised join (orders ⨝ customer) to completion and reading the final
    # adaptive plan shows whether the two agree at this sf_dir.
    from pyspark.sql import functions as F

    from cassandra_util_spark.operators.sketches import plan_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k")
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"), F.col("c_name")
    )
    adv = plan_join(o, c.select("k"), "k").collect()[0]
    joined = o.join(c, "k")
    joined.write.format("noop").mode("overwrite").save()
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    aqe_choice = (
        "broadcast"
        if "BroadcastHashJoin" in jplan
        else ("sort-merge" if "SortMergeJoin" in jplan else "other")
    )
    advice_kind = "broadcast" if adv.advice.startswith("broadcast") else "shuffle"
    agree = "MATCH" if advice_kind == aqe_choice else "MISMATCH"
    lines += [
        "",
        "## Sketch-driven join advisory vs AQE (orders ⨝ customer on custkey)",
        "",
        f"- `plan_join` advice (pre-execution, from CM sketches): "
        f"**{adv.advice}** (n_a={adv.n_a}, n_b={adv.n_b}, "
        f"join_size_estimate={adv.join_size_estimate}, "
        f"hot-key bounds a/b={adv.max_key_est_a}/{adv.max_key_est_b})",
        f"- AQE's runtime choice for the same join: **{aqe_choice}** "
        f"(from the executed adaptive plan)",
        f"- **{agree}**: the sketch advisory reproduces AQE's decision "
        f"without running the join — the information AQE only learns at "
        f"the shuffle boundary is available at plan time from two "
        f"bounded sketch tables.",
    ]

    lines += [
        "",
        "## Repeated non-cheap subtrees",
        "",
        "An expensive expression tree repeated verbatim ≥3 times inside one",
        "plan node is k evaluations per row (the pre-staging",
        "`span_corruption_pairs` shape — 4.2× at x30; SCALING.md r14 note).",
        "Fix: stage the tree as a real column before the consuming",
        "projection.",
        "",
    ]
    if flagged:
        for name, reps in flagged.items():
            lines.append(f"- **{name}**: " + "; ".join(
                f"×{c} `{s[:120]}`" for s, c in reps[:3]
            ))
    else:
        lines.append("- none flagged")

    lines += ["", "## Pushed-filter details", ""] + details
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    if flagged:
        raise SystemExit(
            f"plan_audit: {len(flagged)} quer{'y' if len(flagged) == 1 else 'ies'} "
            "re-evaluate a non-cheap expression subtree ≥3 times in one node "
            "— stage it as a column (withColumn) before the consuming "
            "projection (see SCALING.md r14 span-staging note)"
        )


if __name__ == "__main__":
    main()
