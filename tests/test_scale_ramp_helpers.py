"""Pure-logic tests for scripts/scale_ramp.py's keyed-block upsert
(VERDICT r9 task 4 / r10 task 5): re-running a ramp must REPLACE its
marker-delimited block in SCALING.md, never append a duplicate `# SCALING`
header, and ratio cells with an underflowing denominator print `n/a`
instead of a 1e8x artifact."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "scale_ramp", os.path.join(REPO, "scripts", "scale_ramp.py")
)
scale_ramp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_ramp)


def test_upsert_appends_then_replaces_in_place():
    base = "# SCALING\n\nprose\n"
    one = scale_ramp.upsert_block(base, "q@1,10", "### Ramp: q\n\n| q | 1 |")
    assert one.count("scale_ramp:begin q@1,10") == 1
    # same content again: byte-identical (regen is a no-op diff)
    assert scale_ramp.upsert_block(one, "q@1,10", "### Ramp: q\n\n| q | 1 |") == one
    # new numbers: replaced in place, no duplicate block, prose intact
    two = scale_ramp.upsert_block(one, "q@1,10", "### Ramp: q\n\n| q | 2 |")
    assert two.count("scale_ramp:begin q@1,10") == 1
    assert "| q | 2 |" in two and "| q | 1 |" not in two
    assert "prose" in two


def test_upsert_distinct_keys_coexist():
    base = "# SCALING\n"
    t = scale_ramp.upsert_block(base, "a@1", "A")
    t = scale_ramp.upsert_block(t, "a@1,30", "B")
    assert "begin a@1 -->\nA" in t and "begin a@1,30 -->\nB" in t


def test_upsert_block_content_is_not_a_regex_template():
    base = "x\n<!-- scale_ramp:begin k -->\nold\n<!-- scale_ramp:end k -->\n"
    out = scale_ramp.upsert_block(base, "k", r"path C:\data\5")
    assert r"C:\data\5" in out


def test_ratio_cell_underflow_is_na():
    assert scale_ramp.ratio_cell(10.0, 0.0, 0.05) == "n/a"
    assert scale_ramp.ratio_cell(10.0, 0.04, 0.05) == "n/a"
    assert scale_ramp.ratio_cell(10.0, 2.0, 0.05) == "5.0x"


def test_committed_scaling_md_has_one_header_and_balanced_markers():
    """The r9/r10 duplication (7 `# SCALING` headers) stays fixed: exactly
    one H1, and every begin marker has its end marker."""
    with open(os.path.join(REPO, "SCALING.md")) as f:
        text = f.read()
    headers = [l for l in text.splitlines() if l.startswith("# ")]
    assert len(headers) == 1, headers
    begins = [l for l in text.splitlines() if "scale_ramp:begin" in l]
    ends = [l for l in text.splitlines() if "scale_ramp:end" in l]
    assert len(begins) == len(ends) >= 7
    keys = [l.split("begin ", 1)[1].split(" -->")[0] for l in begins]
    assert len(keys) == len(set(keys))
