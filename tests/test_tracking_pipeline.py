"""End-to-end test of the reference-domain pipeline (SURVEY §3.1 entry
point A) on a synthetic tracking fixture: normalize → kinematics →
geometry → converge rate → separations → labels → route features →
sequences → TrueSpeed.  Hand-computed expectations on a tiny play."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_bowl_spark.operators.normalize import (
    add_postthrow_geometry,
    normalize_coordinates,
)
from big_data_bowl_spark.operators.sequences import build_sequences
from big_data_bowl_spark.operators.tracking import (
    add_converge_rate,
    add_frame_kinematics,
    attach_output_labels,
    compute_catch_separation,
    compute_defender_separation_per_frame,
    compute_initial_separation,
    compute_truespeed,
    filter_to_completed_catches,
    route_features,
    select_target_receiver_rows,
)


@pytest.fixture(scope="module")
def tracking(spark):
    """Two plays: one left-direction (coords must flip), receiver moving
    toward the landing spot with one defender trailing."""
    rows = []
    for play, direction in ((1, "right"), (2, "left")):
        for frame in range(1, 6):
            rows.append(Row(
                game_id=1, play_id=play, nfl_id=10, frame_id=frame,
                play_direction=direction, player_to_predict=True,
                player_side="Offense", player_position="WR",
                player_role="Targeted Receiver",
                x=10.0 + 2.0 * frame, y=20.0, s=2.0, dir=90.0,
                ball_land_x=30.0, ball_land_y=20.0))
            rows.append(Row(
                game_id=1, play_id=play, nfl_id=99, frame_id=frame,
                play_direction=direction, player_to_predict=False,
                player_side="Defense", player_position="CB",
                player_role="Defensive Coverage",
                x=10.0 + 2.0 * frame, y=23.0, s=2.0, dir=90.0,
                ball_land_x=30.0, ball_land_y=20.0))
    return spark.createDataFrame(rows)


def test_normalize_flips_left_plays(tracking):
    out = normalize_coordinates(tracking, dialect="package")
    right = out.filter((F.col("play_id") == 1) & (F.col("frame_id") == 1)
                       & (F.col("nfl_id") == 10)).first()
    left = out.filter((F.col("play_id") == 2) & (F.col("frame_id") == 1)
                      & (F.col("nfl_id") == 10)).first()
    assert right.x_norm == 12.0
    assert left.x_norm == 120.0 - 12.0
    assert left.ball_land_x_norm == 120.0 - 30.0


def test_kinematics_and_geometry(tracking):
    df = normalize_coordinates(tracking.filter(F.col("play_id") == 1))
    df = add_frame_kinematics(df)
    df = add_postthrow_geometry(df, y="y", land_y="ball_land_y")
    r3 = df.filter((F.col("frame_id") == 3) & (F.col("nfl_id") == 10)).first()
    assert abs(r3.dx - 2.0) < 1e-9
    assert abs(r3.speed - 20.0) < 1e-9          # 2 yd per 0.1 s
    assert abs(r3.dist_to_land - (30.0 - 16.0)) < 1e-9
    # moving straight at the landing point → heading aligns with bearing
    assert abs(r3.heading_align_cos - 1.0) < 1e-9


def test_converge_rate_both_dialects(tracking):
    df = normalize_coordinates(tracking.filter(F.col("play_id") == 1))
    df = add_postthrow_geometry(df, y="y", land_y="ball_land_y")
    pkg = add_converge_rate(df, dialect="package")
    nb = add_converge_rate(df, dialect="notebook")
    # closing 2 yd per frame in both dialects (signs arranged to positive)
    p = pkg.filter((F.col("frame_id") == 3) & (F.col("nfl_id") == 10)).first()
    n = nb.filter((F.col("frame_id") == 3) & (F.col("nfl_id") == 10)).first()
    assert abs(p.converge_rate - 2.0) < 1e-9
    assert abs(n.converge_rate - 2.0) < 1e-9
    # boundary frames: package fills first frame, notebook fills last
    first = pkg.filter((F.col("frame_id") == 1) & (F.col("nfl_id") == 10)).first()
    last = nb.filter((F.col("frame_id") == 5) & (F.col("nfl_id") == 10)).first()
    assert first.converge_rate == 0.0 and last.converge_rate == 0.0


def test_separations(tracking):
    one_play = tracking.filter(F.col("play_id") == 1)
    init = compute_initial_separation(one_play).first()
    assert abs(init.separation - 3.0) < 1e-9    # defender 3 yd above
    catch = compute_catch_separation(one_play).first()
    assert abs(catch.separation - 3.0) < 1e-9
    per_frame = compute_defender_separation_per_frame(one_play)
    assert per_frame.count() == 5               # one row per frame
    assert all(abs(r.separation - 3.0) < 1e-9 for r in per_frame.collect())


def test_no_defender_default(spark, tracking):
    offense_only = tracking.filter(F.col("player_side") == "Offense")
    per_frame = compute_defender_separation_per_frame(offense_only,
                                                      default=20.0)
    assert all(r.separation == 20.0 for r in per_frame.collect())


def test_target_filter_and_semi_join(spark, tracking):
    supp = spark.createDataFrame([
        Row(game_id=1, play_id=1, pass_result="C"),
        Row(game_id=1, play_id=2, pass_result="I"),
    ])
    targets = select_target_receiver_rows(tracking)
    assert targets.select("nfl_id").distinct().count() == 1
    kept = filter_to_completed_catches(targets, supp)
    assert {r.play_id for r in kept.select("play_id").distinct().collect()} == {1}


def test_labels_and_truespeed(spark, tracking):
    df = tracking.filter(F.col("play_id") == 1)
    labels = spark.createDataFrame([
        Row(game_id=1, play_id=1, nfl_id=10, frame_id=f,
            x=10.0 + 2.0 * f + 0.5, y=20.0)   # constant +0.5 offset
        for f in range(1, 6)])
    joined = attach_output_labels(df.filter(F.col("nfl_id") == 10), labels)
    resid = joined.withColumn("residual", F.col("y_true_x") - F.col("x"))
    ts = compute_truespeed(resid, agg="mean")
    assert abs(ts.first().truespeed - 0.5) < 1e-9
    rmse = compute_truespeed(resid, agg="rmse")
    assert abs(rmse.first().truespeed - 0.5) < 1e-9


def test_labels_fail_loud_on_key_mismatch(spark, tracking):
    wrong = spark.createDataFrame([
        Row(game_id=7, play_id=7, nfl_id=7, frame_id=1, x=0.0, y=0.0)])
    with pytest.raises(ValueError, match="0-row inner join"):
        attach_output_labels(tracking, wrong)


def test_route_features_values(tracking):
    df = normalize_coordinates(tracking.filter(
        (F.col("play_id") == 1) & (F.col("nfl_id") == 10)))
    feats = route_features(df).first()
    assert abs(feats.route_depth - 8.0) < 1e-9  # 12 → 20 yd
    assert feats.n_frames == 5
    assert abs(feats.path_length - 8.0) < 1e-9  # straight line
    assert feats.direction_changes == 0


def test_sequence_build_on_tracking(tracking):
    df = normalize_coordinates(tracking.filter(F.col("nfl_id") == 10))
    seq = build_sequences(df, ["game_id", "play_id"], "frame_id",
                          ["x_norm", "y"], max_len=3, keep="last")
    r = {row.play_id: row for row in seq.collect()}
    assert r[1].real_len == 3
    # keep='last': frames 3,4,5 → x_norm 16,18,20
    assert [step[0] for step in r[1].seq] == [16.0, 18.0, 20.0]
    seq_first = build_sequences(df, ["game_id", "play_id"], "frame_id",
                                ["x_norm", "y"], max_len=3, keep="first")
    rf = {row.play_id: row for row in seq_first.collect()}
    assert [step[0] for step in rf[1].seq] == [12.0, 14.0, 16.0]


def test_submission_pipeline_end_to_end(spark, tracking):
    """§3.1 entry point A composed end-to-end: every stage returns a frame,
    the scorecard ranks the (single) receiver, TrueSpeed is finite, and the
    sequence/prediction plumbing round-trips through the fallback model."""
    from big_data_bowl_spark.pipeline.submission import run_submission_pipeline

    supp = spark.createDataFrame([
        Row(game_id=1, play_id=1, pass_result="C", yards_gained=12.0,
            expected_points_added=0.8),
        Row(game_id=1, play_id=2, pass_result="C", yards_gained=5.0,
            expected_points_added=-0.2),
    ])
    labels = spark.createDataFrame([
        Row(game_id=1, play_id=p, nfl_id=10, frame_id=f,
            x=10.0 + 2.0 * f + 0.5, y=20.0)
        for p in (1, 2) for f in range(1, 6)])

    out = run_submission_pipeline(spark, tracking, labels, supp,
                                  k_clusters=2, max_len=4)
    assert set(out) == {"normalized", "targets", "postthrow",
                        "route_features", "route_embeddings", "sequences",
                        "predictions", "truespeed", "scorecard"}
    # both completed plays survive to sequences (one receiver each)
    assert out["sequences"].count() == 2
    seq_row = out["sequences"].first()
    assert len(seq_row.seq) == 4 and seq_row.real_len == 4

    # un-pivot drops padded steps: every t is inside the real length
    assert out["predictions"].filter(F.col("t") >= 4).count() == 0
    ts = {r.play_id: r.truespeed for r in out["truespeed"].collect()}
    assert set(ts) == {1, 2} and all(v >= 0.0 for v in ts.values())

    card = out["scorecard"].collect()
    assert len(card) == 1                      # one receiver overall
    assert card[0].nfl_id == 10 and card[0].rank == 1
    assert card[0].n_targets == 2
    assert abs(card[0].total_yards - 17.0) < 1e-9


def test_submission_pipeline_persists_stages(spark, tracking, tmp_path):
    """persist_dir lands every stage like the reference's to_csv chain:
    CSV per relational stage (single file at play/player grain), parquet
    for the array-typed sequence stage; all re-readable."""
    from big_data_bowl_spark.pipeline.submission import run_submission_pipeline

    supp = spark.createDataFrame([
        Row(game_id=1, play_id=p, pass_result="C", yards_gained=7.0,
            expected_points_added=0.1) for p in (1, 2)])
    labels = spark.createDataFrame([
        Row(game_id=1, play_id=p, nfl_id=10, frame_id=f,
            x=10.0 + 2.0 * f + 0.5, y=20.0)
        for p in (1, 2) for f in range(1, 6)])
    out_dir = str(tmp_path / "stages")
    out = run_submission_pipeline(spark, tracking, labels, supp,
                                  k_clusters=2, max_len=4,
                                  persist_dir=out_dir)
    import glob
    for stage in out:
        files = glob.glob(f"{out_dir}/{stage}/part-*")
        assert files, f"stage {stage} not persisted"
    card = spark.read.option("header", "true").csv(f"{out_dir}/scorecard")
    assert card.count() == out["scorecard"].count()
    seq = spark.read.parquet(f"{out_dir}/sequences")
    assert seq.count() == 2
