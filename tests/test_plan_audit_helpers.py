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
