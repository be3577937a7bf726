"""End-to-end Submission pipeline (SURVEY §3.1, entry point A).

The reference's canonical flow — ``Submission.ipynb``: load → normalize →
initial separation → target selection → completed-catch semi-join →
post-throw features → label attach → converge rate → route features →
k-means route clusters → one-hot embeddings → sequence build → model
inference → un-pivot → TrueSpeed → scorecard — composed from this
engine's operators as ONE lazy DataFrame program.  Nothing materializes
until the caller acts on a result; Catalyst sees the whole chain, so
filter pushdown and join planning happen across the entire pipeline, not
per-step as in the eager pandas original.

Data-quality checks (operators/checks.py) are wired at the same points
the reference asserts: non-empty target/completed sets (preprocess.py:
547-549 class), one route-feature row per (game, play, player)
(BDB_2026.ipynb#cell53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.clustering import fit_route_clusters, one_hot_labels
from ..ml.lstm import predict_sequences, train_sequence_model
from ..operators.checks import check_nonempty, check_unique
from ..operators.normalize import add_postthrow_geometry, normalize_coordinates
from ..operators.sequences import build_sequences, unpivot_sequences
from ..operators.tracking import (
    PLAY_KEYS,
    PLAYER_KEYS,
    add_converge_rate,
    add_frame_kinematics,
    attach_output_labels,
    compute_initial_separation,
    compute_truespeed,
    filter_to_completed_catches,
    route_features,
    select_target_receiver_rows,
)
from ..operators.windows import rank_desc

ROUTE_FEATURE_COLS = ["route_depth", "route_width", "path_length",
                      "lateral_range", "net_displacement", "n_frames"]


def run_submission_pipeline(spark: SparkSession, tracking: DataFrame,
                            output_labels: DataFrame, supp: DataFrame, *,
                            k_clusters: int = 12, max_len: int = 25,
                            seed: int = 42, model=None,
                            truespeed_agg: str = "mae",
                            eager_checks: bool = True,
                            persist_dir: str | None = None) -> dict[str, DataFrame]:
    """Run the full §3.1 chain; returns every named intermediate so callers
    can persist/inspect any stage (the reference writes each to CSV).

    ``model=None`` trains the pure-numpy LSTM on the run's own sequence
    tensor (ml/lstm.py; Keras trains the full net instead when present).
    ``eager_checks=False`` skips the fail-loud data-quality actions (each
    one is an extra pass over the chain) — for callers that already
    validated the inputs or run the checks out-of-band.
    """
    chk_nonempty = check_nonempty if eager_checks else lambda df, *a: df
    chk_unique = check_unique if eager_checks else lambda df, *a: df

    # Phase 1 — normalize + target selection (F4, J7, P5, J3)
    norm = normalize_coordinates(tracking, dialect="package")
    init_sep = compute_initial_separation(norm)
    targets = chk_nonempty(select_target_receiver_rows(norm), "targets")
    completed = chk_nonempty(filter_to_completed_catches(targets, supp),
                             "completed-catches")
    sep_keys = [c for c in PLAYER_KEYS if c in init_sep.columns]  # J5
    enriched = completed.join(init_sep, sep_keys, "left")

    # Phase 2 — post-throw features + labels + converge rate (W1-W5, J1)
    post = add_frame_kinematics(enriched)
    post = add_postthrow_geometry(post, y="y", land_y="ball_land_y")
    labeled = attach_output_labels(post, output_labels,
                                   expect_rows=eager_checks)
    conv = add_converge_rate(labeled, dialect="package")

    # Route features → clusters → one-hot embeddings (A3-A8, M1-M3, F17)
    # The clustering input is a PLAY-grain aggregate (orders of magnitude
    # smaller than the frame facts) feeding an ITERATIVE fit: Imputer's
    # per-column median, the scaler moments, and every k-means iteration
    # each re-run the whole upstream chain unless it is persisted —
    # caching the small derived table here is the difference between one
    # upstream pass and ~k_iter+3 of them, at any scale.
    feats = chk_unique(route_features(targets), PLAYER_KEYS,
                       "one-route-per-player").localCheckpoint(eager=True)
    _, preds = fit_route_clusters(feats, ROUTE_FEATURE_COLS,
                                  k=k_clusters, seed=seed)
    emb = one_hot_labels(preds.select(*PLAYER_KEYS, "cluster"),
                         "cluster", k_clusters, prefix="route_emb")
    emb_cols = [f"route_emb_{i}" for i in range(k_clusters)]
    merged = (conv.join(emb, PLAYER_KEYS, "left")
                  .fillna(dict.fromkeys(emb_cols, 0.0)))  # J4 + F9

    # Sequences → inference → un-pivot → TrueSpeed (T1, M7, T2, A1/A2)
    seq = build_sequences(merged, PLAYER_KEYS, "frame_id",
                          ["converge_rate", "dist_to_land"],
                          max_len=max_len, keep="last")
    if model is None:
        # Train the pure-numpy LSTM head on THIS run's sequences (M6):
        # a genuine recurrent model with the reference topology — the
        # tensor is driver-sized by design (§4.3), and the trained model
        # broadcasts into the iterator-pandas-UDF inference seam below.
        model = train_sequence_model(seq)
    pred = predict_sequences(spark, seq, model)
    pred = pred.withColumn("actual", F.transform("seq", lambda s: s[0]))
    long = unpivot_sequences(pred, PLAYER_KEYS, "actual", "pred")
    # Player grain here (not the reference's play-grain default): the
    # scorecard below groups by nfl_id, so keep it through the reduction.
    ts = compute_truespeed(long, agg=truespeed_agg, id_cols=PLAYER_KEYS)

    # Scorecard — production context + rank (A11, J4, W7)
    prod_cols = [c for c in ("yards_gained", "expected_points_added")
                 if c in supp.columns]  # J5 again: tolerate missing context
    plays = ts.join(F.broadcast(supp.select(*PLAY_KEYS, *prod_cols).distinct()),
                    PLAY_KEYS, "left")
    aggs = [F.avg("truespeed").alias("truespeed"),
            F.count(F.lit(1)).alias("n_targets")]
    if "yards_gained" in prod_cols:
        aggs.append(F.sum("yards_gained").alias("total_yards"))
    if "expected_points_added" in prod_cols:
        aggs.append(F.avg("expected_points_added").alias("epa_per_target"))
    scorecard = rank_desc(plays.groupBy("nfl_id").agg(*aggs), "truespeed")

    out = {
        "normalized": norm,
        "targets": targets,
        "postthrow": conv,
        "route_features": feats,
        "route_embeddings": emb,
        "sequences": seq,
        "predictions": long,
        "truespeed": ts,
        "scorecard": scorecard,
    }
    if persist_dir is not None:
        # Reference behavior: every pipeline stage lands as CSV
        # (Submission.ipynb#cell9, BDB_2026.ipynb#cell43/#cell70/#cell107).
        # Play/player-grain stages coalesce to one file like to_csv; the
        # frame-grain stages keep their parallelism.  The sequence stage
        # carries array columns, which CSV can't represent — it stages as
        # parquet, the engine's native format for tensors.
        from ..sources.io import stage_parquet, write_csv
        frame_grain = {"normalized", "targets", "postthrow"}
        for stage, df_out in out.items():
            if stage == "sequences":
                stage_parquet(df_out, f"{persist_dir}/{stage}",
                              mode="overwrite")
            else:
                write_csv(df_out, f"{persist_dir}/{stage}",
                          single_file=stage not in frame_grain)
    return out
