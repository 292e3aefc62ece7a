"""BLOCKING release gate (VERDICT r8 task 1): rounds 7 and 8 both shipped
snapshots whose committed artifacts (ORACLE_LOCAL.json, COVERAGE.md,
PLANS.md, BENCH_FULL.json) silently lagged the query registry — r8 even
shipped `scripts/release_check.py` and then snapshotted a state that FAILS
it.  A detectable-but-advisory gate does not prevent the lapse, so the gate
now runs inside the test suite: registering a query without regenerating
the artifacts turns pytest red, which blocks every commit under the
keep-tests-green discipline.

Cheap to keep green incrementally: after registering a query, run

    python scripts/check_oracle.py <new_query ...> --merge
    python bench.py --only <new_query ...> --merge
    python scripts/coverage_report.py
    python scripts/plan_audit.py

(the two --merge modes fold subset results into the committed records; the
full-registry regeneration still happens once, at the end-of-round
snapshot).
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_release_artifacts_current():
    import release_check

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = release_check.main()
    assert rc == 0, f"release gate failed:\n{buf.getvalue()}"
