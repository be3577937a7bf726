"""Host-health preflight on the committed-record paths (r12, VERDICT
item 1): round 11's driver bench ran on a host whose single-thread
calibration probe measured 0.363s vs the 0.031-0.051 history — a
silent 7x degradation.  The comparison gates are noise-robust, but a
budget/record WRITTEN in such a session would loosen every future
gate by the host factor, so every --record path must refuse when the
probe is out of band.  These tests pin the decision logic and run the
two recording scripts end-to-end with a faked degraded probe
(SPARK_GRAFT_FAKE_CALIBRATION — the documented test seam) to verify
they exit before touching the committed files."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# module-level so every test in this file is runnable in isolation
# (r12 ADVICE: the insert used to live inside one test body, so
# `pytest -k test_gate_host_factor_discount` failed on import)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench  # noqa: E402


def test_calibration_norm_is_committed():
    norm = bench.calibration_norm()
    with open(os.path.join(REPO, "BASELINE.json")) as fh:
        assert norm == json.load(fh)["calibration_norm_sec"]
    # the r01-r10 healthy history must sit inside the accepted band
    for healthy in (0.031, 0.046, 0.051):
        assert not bench.host_degraded(healthy, norm)
    # the r11 degraded-session values must trip it
    for degraded in (0.363, 0.407):
        assert bench.host_degraded(degraded, norm)
    # a 2x-FAST probe is equally out of band: budgets recorded there
    # would fail every honest session later
    assert bench.host_degraded(norm / 3.0, norm)


def test_require_healthy_host_blocks_on_fake_degraded(monkeypatch):
    # fake BOTH probes (r13): with only the single probe faked the
    # healthy-path assertion measures the real parallel probe, which
    # legitimately reads degraded while the suite itself loads the
    # host — the test must be hermetic
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION_PARALLEL", "0.31")
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION", "0.363")
    with pytest.raises(SystemExit) as ei:
        bench.require_healthy_host("unit-test")
    assert ei.value.code == 3
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION", "0.045")
    assert bench.require_healthy_host("unit-test") == 0.045


@pytest.mark.parametrize("script,args", [
    ("scripts/stress_check.py", ["--record"]),
    ("scripts/stress_check.py", ["--record-reset"]),
    ("scripts/bench_full_check.py", ["--record"]),
])
def test_record_paths_refuse_degraded_host(script, args):
    """End-to-end: a degraded probe makes --record exit(3) BEFORE any
    Spark work or file write (the refusal happens in the preflight, so
    the subprocess returns in well under a second)."""
    budgets_path = os.path.join(REPO, "scripts", "stress_budgets.json")
    before = open(budgets_path).read()
    env = dict(os.environ, SPARK_GRAFT_FAKE_CALIBRATION="0.9")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        env=env, capture_output=True, text=True, timeout=60)
    assert proc.returncode == 3, proc.stderr
    assert "REFUSING" in proc.stderr
    assert open(budgets_path).read() == before  # nothing written


def test_bench_only_rejects_unknown_query_names():
    """ADVICE r12: a typo in SPARK_GRAFT_ONLY must fail fast, not
    silently time an empty set."""
    env = dict(os.environ, SPARK_GRAFT_ONLY="q_definitely_not_a_query")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 2
    assert "q_definitely_not_a_query" in proc.stderr


def test_stress_record_max_merge():
    """r12 (ADVICE): --record merges via max() so one fast session
    can't tighten a committed multi-session-max budget; new entries
    take their fresh value; a slower fresh value raises the budget."""
    from stress_check import merge_budgets

    old = {"q_a": 10.0, "q_b": 5.0}
    fresh = {"q_a": 7.0, "q_b": 6.5, "q_new": 3.0}
    merged = merge_budgets(old, fresh, verbose=False)
    assert merged == {"q_a": 10.0, "q_b": 6.5, "q_new": 3.0}
    # entries dropped from the watch list don't survive the merge
    assert "q_gone" not in merge_budgets({"q_gone": 9.9}, fresh,
                                         verbose=False)


def test_stress_record_reset_scoping():
    """Scoped --record-reset drops only the named queries from the
    committed side of the merge; bare reset drops everything."""
    from stress_check import merge_budgets, prior_for_merge

    prior = {"stress_sec_budget": {"q_a": 10.0, "q_b": 5.0},
             "ratio_info": {"q_a": 2.0, "q_b": 3.0}}
    fresh = {"q_a": 4.0, "q_b": 4.0}
    # plain record: max-merge both
    old_b, _ = prior_for_merge(prior, reset=False, reset_names=set())
    assert merge_budgets(old_b, fresh, verbose=False) == \
        {"q_a": 10.0, "q_b": 5.0}
    # scoped reset: q_a re-baselines, q_b still max-merges
    old_b, old_r = prior_for_merge(prior, reset=True,
                                   reset_names={"q_a"})
    assert merge_budgets(old_b, fresh, verbose=False) == \
        {"q_a": 4.0, "q_b": 5.0}
    assert "q_a" not in old_r and old_r["q_b"] == 3.0
    # bare reset: everything re-baselines
    old_b, old_r = prior_for_merge(prior, reset=True, reset_names=set())
    assert (old_b, old_r) == ({}, {})


def test_parallel_probe_gate(monkeypatch):
    """r13 (VERDICT item 1): the 8-thread parallel probe catches
    multi-core contention the single probe can't see; gated one-sided
    (a fast parallel probe is a healthier host, never a refusal)."""
    norm = bench.calibration_parallel_norm()
    with open(os.path.join(REPO, "BASELINE.json")) as fh:
        assert norm == json.load(fh)["calibration_parallel_norm_sec"]
    assert not bench.host_degraded_parallel(norm, norm)
    assert not bench.host_degraded_parallel(norm * 1.9, norm)
    assert bench.host_degraded_parallel(norm * 2.1, norm)
    # one-sided: fast never trips
    assert not bench.host_degraded_parallel(norm / 10.0, norm)
    # require_healthy_host refuses on a degraded PARALLEL probe even
    # when the single-thread probe reads healthy (the r12 blind spot)
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION", "0.045")
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION_PARALLEL",
                       str(norm * 3))
    with pytest.raises(SystemExit) as ei:
        bench.require_healthy_host("unit-test")
    assert ei.value.code == 3
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION_PARALLEL",
                       str(norm))
    assert bench.require_healthy_host("unit-test") == 0.045


def test_fake_seam_warns_loudly(monkeypatch, capsys):
    """r12 ADVICE: a fake-calibration env var faking a HEALTHY probe
    must at least announce itself on the record path."""
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION", "0.045")
    monkeypatch.setenv("SPARK_GRAFT_FAKE_CALIBRATION_PARALLEL", "0.31")
    bench.require_healthy_host("unit-test")
    err = capsys.readouterr().err
    assert "FAKED" in err
    assert "SPARK_GRAFT_FAKE_CALIBRATION" in err


def test_plain_record_never_drops_committed(monkeypatch):
    """r12 ADVICE: prior_for_merge must not pop reset_names unless
    reset is True (`--record q_foo` used to silently re-baseline)."""
    from stress_check import prior_for_merge

    prior = {"stress_sec_budget": {"q_a": 10.0},
             "ratio_info": {"q_a": 2.0}}
    old_b, old_r = prior_for_merge(prior, reset=False,
                                   reset_names={"q_a"})
    assert old_b == {"q_a": 10.0} and old_r == {"q_a": 2.0}


def test_stress_positional_args_require_reset_flag():
    """r12 ADVICE: `stress_check.py --record q_foo` must fail fast
    instead of silently timing the full set and max-merging."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/stress_check.py"),
         "--record", "q_grid_knn"],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 2
    assert "--record-reset" in proc.stdout


def test_quarantine_path_suffixes_basename_only():
    """r12 ADVICE: the _degraded rename must touch only the basename
    (a '.json' in a directory component used to get corrupted)."""
    assert bench.quarantine_path("/a/b/BENCH_DETAIL.json") == \
        "/a/b/BENCH_DETAIL_degraded.json"
    assert bench.quarantine_path("/a/x.json.d/BENCH_FULL.json") == \
        "/a/x.json.d/BENCH_FULL_degraded.json"


def test_flat_slowdown_guard(tmp_path):
    """r13 (VERDICT item 1): a session whose fresh timings are flat
    >1.3x the committed record on the fixed pure-JVM subset is
    host-inflated and must quarantine; one slow outlier (a stall
    window or a single genuine regression) must NOT trip the median."""
    committed = {q: 1.0 for q in bench.FLAT_PROBE_SUBSET}
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text(json.dumps({"queries": committed}))
    flat = {q: 1.5 for q in bench.FLAT_PROBE_SUBSET}
    assert bench.flat_slowdown_vs_committed(flat, str(p)) == 1.5
    healthy = dict.fromkeys(bench.FLAT_PROBE_SUBSET, 1.05)
    healthy[bench.FLAT_PROBE_SUBSET[0]] = 9.0  # one stall victim
    assert bench.flat_slowdown_vs_committed(healthy, str(p)) == 1.05
    # missing committed record / too few overlapping queries -> None
    assert bench.flat_slowdown_vs_committed(flat,
                                            str(tmp_path / "nope")) is None
    p.write_text(json.dumps({"queries": {"q_tpch_q1": 1.0,
                                         "q_tpch_q5": 1.0}}))
    assert bench.flat_slowdown_vs_committed(flat, str(p)) is None


def test_gate_host_factor_discount():
    """r12: gate paths DISCOUNT on a degraded host (record paths
    refuse).  The q_media_ahash incident pinned numerically: committed
    1.00s, fresh 2.06s in a session whose probe read 0.131 vs norm
    0.045 — raw rule trips, host-factor rule doesn't; while a genuine
    2x-in-calibrated-units regression trips under both."""
    from bench_full_check import host_factor, trips

    norm = 0.045
    assert host_factor(None, norm) == 1.0
    assert host_factor(0.045, norm) == 1.0
    assert host_factor(0.03, norm) == 1.0   # fast probe never tightens
    hf = host_factor(0.131, norm)
    assert abs(hf - 0.131 / 0.045) < 1e-9
    # the incident: host noise, not a regression
    assert trips(2.06, 1.00, 1.0)
    assert not trips(2.06, 1.00, hf)
    # a real regression (4.3x in raw seconds on the same sick host
    # = >2x in calibrated units) still trips
    assert trips(8.6, 1.00, hf)


def test_check_bench_record_blocks_inflated_working_tree(tmp_path,
                                                        monkeypatch):
    """r14 (VERDICT item 1): the r12 AND r13 round-closing commits each
    replaced the committed clean BENCH_DETAIL.json with a contended
    driver session via plain `git commit` — the one path bench.py's
    --record guards cannot see.  check_bench_record compares the
    working-tree record to HEAD's copy and refuses on a flat slowdown."""
    import check_bench_record as cbr

    repo = tmp_path / "repo"
    repo.mkdir()
    env = {**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}

    def git(*args):
        subprocess.run(["git", "-C", str(repo), *args], check=True,
                       env=env, capture_output=True)

    git("init")
    clean = {"queries": {q: 1.0 for q in bench.FLAT_PROBE_SUBSET}}
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(clean))
    git("add", "BENCH_DETAIL.json")
    git("commit", "-m", "clean record")
    # working tree == HEAD -> fine
    assert cbr.check_record(str(repo), "BENCH_DETAIL.json") is None
    # a flat 1.5x-slower working-tree record (the overwrite shape) -> refuse
    slow = {"queries": {q: 1.5 for q in bench.FLAT_PROBE_SUBSET}}
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(slow))
    reason = cbr.check_record(str(repo), "BENCH_DETAIL.json")
    assert reason and "flat 1.5x slower" in reason
    # one stall-window victim in an otherwise-clean record -> fine
    noisy = {"queries": dict.fromkeys(bench.FLAT_PROBE_SUBSET, 1.05)}
    noisy["queries"][bench.FLAT_PROBE_SUBSET[0]] = 9.0
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(noisy))
    assert cbr.check_record(str(repo), "BENCH_DETAIL.json") is None
    # a record that is not committed at all -> nothing to compare
    assert cbr.check_record(str(repo), "BENCH_FULL.json") is None
