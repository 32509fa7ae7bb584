"""Evidence-manifest guard (VERDICT r4 item 5, weak #4).

benchmarks/README.md is the index of committed evidence; rounds 3 and 4
both shipped README rows promising artifacts that did not exist. This
test makes that failure mode impossible to commit silently:

  * every non-pending row's artifact file must exist,
  * every row marked **pending** must NOT exist yet (a stale pending
    marker on a delivered artifact is also a lie, in the other
    direction),
  * every file under benchmarks/ must be listed in the README table
    (unindexed artifacts — like round 4's silently-committed eval608
    collapse — are exactly how misleading evidence accretes).
"""
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, "benchmarks")
README = os.path.join(BENCH_DIR, "README.md")


def manifest_rows():
    """(path, pending) per README table row with a backticked artifact path."""
    rows = []
    for line in open(README):
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if not cells or cells[0].startswith("---") or cells[0] == "artifact":
            continue
        m = re.match(r"`([^`]+)`", cells[0])
        if not m or cells[0].startswith("`pytest") or "(test" in cells[0]:
            continue
        path = m.group(1)
        if "(config" in (cells[1] if len(cells) > 1 else ""):
            pending = False
        else:
            pending = "**pending**" in cells[0]
        rows.append((path, pending))
    return rows


def test_readme_has_rows():
    rows = manifest_rows()
    assert len(rows) >= 10, f"README table parse broke: {rows}"


@pytest.mark.parametrize("path,pending", manifest_rows(),
                         ids=[p for p, _ in manifest_rows()])
def test_manifest_row_matches_disk(path, pending):
    full = os.path.join(BENCH_DIR, path)
    if pending:
        assert not os.path.exists(full), (
            f"benchmarks/README.md marks {path} as pending but the file "
            f"exists — remove the pending marker and describe what it pins")
    else:
        assert os.path.exists(full), (
            f"benchmarks/README.md lists {path} as existing evidence but "
            f"the file is absent — mark the row **pending** or commit the "
            f"artifact (VERDICT r4 weak #4: claims must not run ahead of "
            f"reality)")


def test_no_unindexed_artifacts():
    listed = {p for p, _ in manifest_rows()}
    on_disk = []
    for root, _, files in os.walk(BENCH_DIR):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), BENCH_DIR)
            if rel != "README.md":
                on_disk.append(rel)
    unindexed = [p for p in on_disk if p not in listed]
    assert not unindexed, (
        f"files in benchmarks/ not listed in README.md's table: {unindexed} "
        f"— every committed artifact must say what it pins (round 4's "
        f"eval608 collapse was committed unindexed and read as parity "
        f"evidence)")
