#!/bin/bash
# Round-closing ritual: the full dual-SF oracle sweep (every query vs
# DuckDB at sf0.01 AND sf0.1) that caught q_path_analysis's
# microsecond-floor bug in r7 — run before declaring a round done.
# Fails non-zero on the first SF that has any failure.
#
# r9 adds the STRESS LEG: the density-sensitive subset timed at sf1.0
# (replica stress data, generated on demand) with per-query ABSOLUTE
# sf1.0 seconds budgets (scripts/stress_budgets.json, x2 AND +2s —
# r11: ratio gates false-alarmed on this host's noisy sf0.1
# denominators; the sf1.0 numerators are stable, see stress_check.py).
# The r8 one-off stress sweep caught the only real plan defect of
# rounds 6-8 (grid NN density-quadratic); this makes that detection
# recurring.  Skip with SKIP_STRESS=1 when iterating on correctness.
#
# r10 adds the PYTEST LEG: r8 and r9 both closed with a red test the
# oracle sweeps can't see (PAV twin; README count self-check).  The
# ritual now runs the full suite first, so a red test fails the round.
# Skip with SKIP_PYTEST=1 only when iterating on a single query.
# r14 adds the BENCH-RECORD INTEGRITY LEG (first): the r12 and r13
# round-closing commits each replaced the committed clean
# BENCH_DETAIL.json with a contended driver session's map via a plain
# `git commit`, bypassing bench.py's --record guards.  The ritual now
# refuses while the working tree holds a flat-slower record than HEAD's
# committed copy (same median-ratio rule as bench.py's overwrite guard;
# SPARK_GRAFT_ALLOW_FLAT_SLOWDOWN=1 is the intentional-change hatch).
set -e
cd "$(dirname "$0")/.."
echo "=== bench-record integrity (working tree vs HEAD) ==="
python scripts/check_bench_record.py
if [ -z "$SKIP_PYTEST" ]; then
  echo "=== pytest leg ==="
  python -m pytest tests/ -q
fi
echo "=== sweep sf0.01 ==="
# the sf0.01 sweep refreshes the committed full-registry correctness
# artifact (r13, VERDICT item 4): every registered query's oracle
# evidence in one checkable file
DRIVE_SF_DIR=/root/testdata/sf0.01 DRIVE_ARTIFACT=CORRECTNESS_FULL.json \
  python scripts/drive_driver.py
echo "=== sweep sf0.1 ==="
DRIVE_SF_DIR=/root/testdata/sf0.1 python scripts/drive_driver.py
if [ -z "$SKIP_STRESS" ]; then
  echo "=== stress leg (sf1.0 density watch) ==="
  python scripts/stress_check.py
fi
# r11 adds the FULL-BENCH LEG: every registered query timed at sf0.1
# and gated against the committed BENCH_FULL.json (x2 ratio AND +1s
# absolute — the one place a long-tail perf regression could hide).
# Skip with SKIP_BENCHFULL=1 when iterating on correctness.
if [ -z "$SKIP_BENCHFULL" ]; then
  echo "=== full-bench leg (all queries vs committed BENCH_FULL.json) ==="
  python scripts/bench_full_check.py
fi
echo "close_round: all legs green"
