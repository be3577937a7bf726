"""Refuse to close a round whose working-tree bench record is host-inflated.

The r12 AND r13 round-closing commits both replaced the committed clean
``BENCH_DETAIL.json`` with a contended driver session's map — arriving
through a plain ``git commit`` of the working tree, the one path
``bench.py``'s ``--record``-side guards cannot see.  This check closes
that channel for the ritual: it compares the WORKING-TREE record against
the committed (HEAD) copy with the same ``flat_slowdown_vs_committed``
median-ratio rule bench.py uses, and exits non-zero when the working
tree holds a flat-slower map that would loosen every future gate.

Exit codes: 0 ok (or nothing to compare), 4 working-tree record is
flat-slower than HEAD's and must not be committed.

``SPARK_GRAFT_ALLOW_FLAT_SLOWDOWN=1`` skips the check, mirroring
bench.py's escape hatch for an intentional global change.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

RECORDS = ("BENCH_DETAIL.json", "BENCH_FULL.json")


def check_record(repo: str, name: str) -> str | None:
    """None when fine; a human-readable refusal reason otherwise."""
    wt_path = os.path.join(repo, name)
    if not os.path.exists(wt_path):
        return None
    try:
        with open(wt_path) as fh:
            fresh = json.load(fh)["queries"]
    except (OSError, KeyError, ValueError) as exc:
        return f"{name}: working-tree copy unreadable ({exc})"
    head = subprocess.run(
        ["git", "-C", repo, "show", f"HEAD:{name}"],
        capture_output=True, text=True)
    if head.returncode != 0:
        return None  # new file — nothing committed to compare against
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as tf:
        tf.write(head.stdout)
        head_path = tf.name
    try:
        flat = bench.flat_slowdown_vs_committed(fresh, head_path)
    finally:
        os.unlink(head_path)
    if flat is not None and flat > bench.FLAT_SLOWDOWN_FACTOR:
        return (f"{name}: working-tree record is a flat {flat}x slower "
                f"than HEAD's committed copy on the fixed pure-JVM probe "
                f"subset (> {bench.FLAT_SLOWDOWN_FACTOR}) — a "
                f"host-inflated session must not replace the clean "
                f"record.  Restore it (git checkout HEAD -- {name}) or, "
                f"for an INTENTIONAL global change, set "
                f"SPARK_GRAFT_ALLOW_FLAT_SLOWDOWN=1.")
    return None


def main() -> int:
    if os.environ.get("SPARK_GRAFT_ALLOW_FLAT_SLOWDOWN") == "1":
        print("check_bench_record: skipped "
              "(SPARK_GRAFT_ALLOW_FLAT_SLOWDOWN=1)")
        return 0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = False
    for name in RECORDS:
        reason = check_record(repo, name)
        if reason:
            sys.stderr.write(f"check_bench_record: {reason}\n")
            bad = True
        else:
            print(f"check_bench_record: {name} ok")
    return 4 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
