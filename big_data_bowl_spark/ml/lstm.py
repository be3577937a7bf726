"""M6/M7: the sequence-model boundary — the engine's ONE genuine Python/
pandas-UDF surface (SURVEY §2.10 summary).

The reference trains a Keras LSTM on driver-collected tensors
(bdb2026/models.py:24-138: Masking→LSTM(64)→Dropout→LSTM(32)→Dropout→
TD Dense(16)→TD Dense(1), Adam 1e-3, MSE, early stopping) and predicts in
one batch (Submission.ipynb#cell7).  The Spark-side contract:

- training data fits on the driver (≈15 MB at reference scale): collect the
  T1 array column, train with Keras *if installed*.
- inference is distributed: an iterator-of-batches pandas UDF with the
  model weights broadcast once per executor — Arrow batches in, Arrow
  batches out, no per-row Python.

Keras/TensorFlow are NOT in this container, so the trainer is gated behind
an import-try and a deterministic fallback model (exponential-moving-
average predictor) keeps the full pipeline runnable and testable: the
plumbing — schema, broadcast, batch iteration, un-pivot — is identical
either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

try:  # pragma: no cover - not installed in this container
    import keras  # noqa: F401
    HAS_KERAS = True
except Exception:  # pragma: no cover
    HAS_KERAS = False


class EmaFallbackModel:
    """Deterministic stand-in for the LSTM: predicts an exponential moving
    average of the first feature per timestep.  Mask semantics preserved:
    all-zero feature rows are padding and predict 0.0 (models.py:79-83)."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha

    def predict(self, x: np.ndarray) -> np.ndarray:
        # x: (N, T, F) float32 → (N, T) predictions
        n, t, _ = x.shape
        out = np.zeros((n, t), dtype=np.float32)
        mask = np.any(x != 0.0, axis=2)
        ema = x[:, 0, 0]
        for step in range(t):
            ema = np.where(mask[:, step],
                           self.alpha * x[:, step, 0] + (1 - self.alpha) * ema,
                           ema)
            out[:, step] = np.where(mask[:, step], ema, 0.0)
        return out

    def get_weights(self):
        return {"alpha": self.alpha}


def train_sequence_model(seq_df: DataFrame, seq_col: str = "seq",
                         target_idx: int = 0, **fit_kw):
    """M6: collect the (small) tensor to the driver and train.  Falls back
    to the deterministic EMA model when Keras is unavailable."""
    if not HAS_KERAS:
        return EmaFallbackModel()
    rows = seq_df.select(seq_col).collect()  # ≈15 MB at reference scale
    x = np.asarray([r[0] for r in rows], dtype=np.float32)
    y = x[:, :, target_idx]
    model = _build_lstm(x.shape[1], x.shape[2])
    model.fit(x, y, **fit_kw)
    return model


def _build_lstm(timesteps: int, n_features: int):  # pragma: no cover
    """Masking→LSTM(64)→Dropout(.3)→LSTM(32)→Dropout(.2)→TD Dense(16 relu)
    →TD Dense(1) — the reference topology (bdb2026/models.py:24-66)."""
    from keras import layers, models, optimizers
    m = models.Sequential([
        layers.Masking(mask_value=0.0, input_shape=(timesteps, n_features)),
        layers.LSTM(64, return_sequences=True),
        layers.Dropout(0.3),
        layers.LSTM(32, return_sequences=True),
        layers.Dropout(0.2),
        layers.TimeDistributed(layers.Dense(16, activation="relu")),
        layers.TimeDistributed(layers.Dense(1)),
    ])
    m.compile(optimizer=optimizers.Adam(1e-3), loss="mse")
    return m


def predict_sequences(spark: SparkSession, seq_df: DataFrame, model,
                      seq_col: str = "seq",
                      out_col: str = "pred") -> DataFrame:
    """M7: distributed batch inference via an iterator-of-batches pandas
    UDF.  The model is broadcast ONCE; each executor deserializes it once
    per task, then streams Arrow batches — the standard
    broadcast-model-inference pattern (SURVEY §4.3 item 4)."""
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(ArrayType(FloatType()))
    def infer(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        local = bc.value  # one deserialize per task, amortized over batches
        for series in batches:
            # Arrow hands nested arrays as object arrays — stack explicitly
            # so the tensor is always (N, T, F)
            x = np.stack([
                np.stack([np.asarray(step, dtype=np.float32) for step in v])
                for v in series])
            preds = local.predict(x)
            yield pd.Series(list(preds.astype(np.float32)))

    return seq_df.withColumn(out_col, infer(F.col(seq_col)))


def eval_predictions(long_df: DataFrame, actual: str = "actual",
                     pred: str = "pred") -> DataFrame:
    """M9: MSE/RMSE/MAE/R² over non-padded steps (BDB_2026.ipynb#cell102).

    R² is computed ALGEBRAICALLY — SStot = Σy² − (Σy)²/n — so the whole
    evaluation is ONE partial-aggregable pass: map-side combine on every
    partition, one tiny merge.  (The naive form needs the global mean
    first; supplying it via an empty-partition window funnels every row
    through a single task — a scale-killer on exploded prediction rows.)"""
    e = F.col(actual) - F.col(pred)
    y = F.col(actual)
    ss_tot = (F.sum(F.pow(y, 2))
              - F.pow(F.sum(y), 2) / F.count(F.lit(1)))
    return long_df.agg(
        F.avg(F.pow(e, 2)).alias("mse"),
        F.sqrt(F.avg(F.pow(e, 2))).alias("rmse"),
        F.avg(F.abs(e)).alias("mae"),
        (1 - F.sum(F.pow(e, 2)) / ss_tot).alias("r2"))
