"""Full-registry timing gate (r11, VERDICT item 1): every name in
QUERIES gets a committed sf0.1 wall-time (BENCH_FULL.json), and this
script gates a FRESH full-bench run against that record — the
stress_check discipline applied to the 157 queries the headline set
never timed, where a 10x slowdown used to pass every committed gate.

A query regresses only if BOTH hold (the r9/r10 verdicts' own rule,
widened for host noise — this VM shows transient multi-second stall
windows even under bench.py's min-of-two-interleaved-passes):

    fresh > committed * RATIO  AND  fresh - committed > ABS_SLACK

New queries (no committed record) are reported, not failed — commit
the refreshed BENCH_FULL.json to give them a record.

Usage:
    python scripts/bench_full_check.py            # run + gate
    python scripts/bench_full_check.py --record   # run + overwrite record
Env:
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS pass through to bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
RECORD_PATH = os.path.join(REPO, "BENCH_FULL.json")
RETRY_LOG = os.path.join(HERE, "bench_retry_log.json")

RATIO = 2.0
ABS_SLACK = 1.0  # seconds


def host_factor(calibration_sec, norm: float) -> float:
    """Gate-side twin of the --record preflight (r12): --record REFUSES
    on a degraded host, but a GATE run can't refuse — the round must
    still close — so it discounts instead.  The committed budgets were
    written inside the healthy calibration band (preflight-enforced);
    when the fresh session's probe reads k× the norm, single-thread /
    Python-worker-bound queries inflate by ~k on raw seconds with NO
    code change (observed: q_media_ahash 1.00s → 2.06s while the probe
    read 0.131 vs norm 0.045 — in calibrated units the query was
    FASTER than committed).  Scaling the trip thresholds by k keeps
    the gate meaningful on a sick host: a real 2× plan regression
    still trips (it regresses in calibrated units too), while pure
    host noise no longer fails the leg.  Never discounts below 1."""
    if not calibration_sec or not norm:
        return 1.0
    return max(1.0, float(calibration_sec) / norm)


def trips(fresh: float, base: float, hf: float = 1.0) -> bool:
    """The gate rule, host-factor-aware: regression iff fresh exceeds
    BOTH the ratio and the absolute slack, each scaled by hf."""
    return fresh > base * RATIO * hf and fresh - base > ABS_SLACK * hf


def log_recoveries(entries: list[dict]) -> None:
    """Append retry-recovered queries to the committed log (r12,
    ADVICE): a retry that clears a query is the right noise call for
    one session, but the SAME query recovering round after round is an
    intermittent real regression hiding behind the retry — the log
    makes that visible (grep a query name; entry count = strikes)."""
    hist: list[dict] = []
    if os.path.exists(RETRY_LOG):
        with open(RETRY_LOG) as fh:
            hist = json.load(fh)
    hist.extend(entries)
    with open(RETRY_LOG, "w") as fh:
        json.dump(hist, fh, indent=1, sort_keys=True)
        fh.write("\n")
    counts: dict[str, int] = {}
    for e in hist:
        counts[e["query"]] = counts.get(e["query"], 0) + 1
    repeat = {q: c for q, c in counts.items() if c > 1}
    if repeat:
        print(f"bench_full_check: queries with REPEATED retry "
              f"recoveries across sessions (see {RETRY_LOG}): {repeat}")


def main() -> None:
    record = "--record" in sys.argv
    if record:
        # host-health preflight (r12): never write the committed
        # record from a degraded session — r11's driver host ran 7x
        # slow and a record written there would loosen every future
        # gate by that factor
        import bench
        bench.require_healthy_host("bench_full_check --record")

    committed: dict[str, float] = {}
    if os.path.exists(RECORD_PATH) and not record:
        with open(RECORD_PATH) as fh:
            committed = json.load(fh)["queries"]

    # fresh full run; bench.py writes BENCH_FULL.json itself (sf0.1),
    # which doubles as the refreshed record when --record
    env = dict(os.environ, SPARK_GRAFT_BENCH_FULL="1")
    if committed:
        # don't clobber the committed record on a plain gate run
        env["SPARK_GRAFT_DETAIL"] = os.path.join(
            REPO, "BENCH_FULL_fresh.json")
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True)
    tail = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode != 0 or not tail:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        sys.exit(proc.returncode or 1)
    print(tail[-1])
    summary = json.loads(tail[-1])
    # bench.py quarantines the committed record to a _degraded name
    # when the run's calibration lands out of band — follow its
    # detail_file so a mid-run degradation can't desync this reader
    detail_path = env.get("SPARK_GRAFT_DETAIL") or os.path.join(
        REPO, summary.get("detail_file", os.path.basename(RECORD_PATH)))
    with open(detail_path) as fh:
        fresh = json.load(fh)["queries"]

    if record or not committed:
        if summary.get("degraded_host"):
            sys.stderr.write(
                "bench_full_check: run degraded mid-session "
                f"(calibration {summary.get('calibration_sec')}s) — "
                "committed record NOT refreshed\n")
            sys.exit(3)
        print(f"bench_full_check: recorded {len(fresh)} query times -> "
              f"{RECORD_PATH}")
        return

    new = sorted(set(fresh) - set(committed))
    if new:
        print(f"bench_full_check: {len(new)} queries have no committed "
              f"record (commit a refreshed BENCH_FULL.json): {new}")
    import bench
    norm = bench.calibration_norm()
    hf = host_factor(summary.get("calibration_sec"), norm)
    if hf > 1.05:
        print(f"bench_full_check: host degraded this session "
              f"(calibration {summary.get('calibration_sec')}s vs norm "
              f"{norm}s) — trip thresholds scaled x{hf:.2f}")
    bad = []
    for name, t in sorted(fresh.items()):
        base = committed.get(name)
        if base is None:
            continue
        if trips(t, base, hf):
            bad.append((name, base, t))
    if bad:
        # retry pass (r11): per-query latency on this host is
        # heavy-tailed (q_theil_sen measured 1.3s / 6.6s / 18.9s across
        # one four-run sequence — a 1-task applyInPandas paying Python
        # worker spin-up at the tail), and min-of-two-interleaved-passes
        # can still land both samples slow.  Re-time ONLY the tripped
        # queries in a FRESH session (the repo's documented stall-window
        # rule) and fail only what trips twice; a real regression fails
        # the retry just the same.
        names = ",".join(n for n, _, _ in bad)
        print(f"bench_full_check: {len(bad)} over budget — retrying "
              f"in a fresh session: {names}")
        retry_path = os.path.join(REPO, "BENCH_FULL_retry.json")
        env2 = dict(os.environ, SPARK_GRAFT_BENCH_FULL="1",
                    SPARK_GRAFT_ONLY=names,
                    SPARK_GRAFT_DETAIL=retry_path)
        proc2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env2, capture_output=True, text=True)
        if proc2.returncode != 0:
            sys.stderr.write(proc2.stdout[-4000:] + proc2.stderr[-4000:])
            sys.exit(proc2.returncode)
        with open(retry_path) as fh:
            retry_summary = json.load(fh)
        retried = retry_summary["queries"]
        os.remove(retry_path)
        hf2 = host_factor(retry_summary.get("calibration_sec"), norm)
        if hf2 > 1.05:
            print(f"bench_full_check: retry session also degraded "
                  f"(calibration {retry_summary.get('calibration_sec')}s)"
                  f" — retry thresholds scaled x{hf2:.2f}")
        confirmed = []
        recovered = []
        for name, base, t in bad:
            t2 = retried.get(name, t)
            if trips(t2, base, hf2):
                confirmed.append((name, base, min(t, t2)))
            else:
                print(f"bench_full_check: {name} recovered on retry "
                      f"({t:.2f}s -> {t2:.2f}s vs committed {base:.2f}s) "
                      f"— host noise, not a regression")
                recovered.append({
                    "query": name, "committed_sec": base,
                    "first_sec": round(t, 3), "retry_sec": round(t2, 3),
                    "calibration_sec": summary.get("calibration_sec")})
        if recovered:
            log_recoveries(recovered)
        bad = confirmed
    if bad:
        for name, base, t in bad:
            print(f"BENCH REGRESSION {name}: {base:.2f}s -> {t:.2f}s "
                  f"(> x{RATIO} and > +{ABS_SLACK}s, twice)")
        sys.exit(1)
    print(f"bench_full_check: all {len(fresh)} query times within "
          f"x{RATIO}/+{ABS_SLACK}s of the committed record")


if __name__ == "__main__":
    main()
