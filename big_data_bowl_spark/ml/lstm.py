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


class LinearBlendModel:
    """Deterministic injected predictor for spine verification
    (q_submission_spine): per timestep pred = w0·x₀ + w1·x₁, computed in
    FLOAT64 so the inference seam's single float32 cast
    (predict_sequences' ``astype(np.float32)``) is the ONLY rounding —
    a SQL oracle reproduces it as one CAST(… AS REAL) of an exact
    double blend.  Requires ≥2 features.  Padding rows (all-zero
    features) predict 0.0, matching the Masking contract the real
    models follow (irrelevant downstream — un-pivot drops padded steps
    — but kept for interface parity)."""

    def __init__(self, w0: float = 0.5, w1: float = 0.25):
        self.w0, self.w1 = float(w0), float(w1)

    def predict(self, x: np.ndarray) -> np.ndarray:
        # x: (N, T, F) float32 → (N, T) float64 predictions
        out = (self.w0 * x[:, :, 0].astype(np.float64)
               + self.w1 * x[:, :, 1].astype(np.float64))
        mask = np.any(x != 0.0, axis=2)
        return np.where(mask, out, 0.0)

    def get_weights(self):
        return {"w0": self.w0, "w1": self.w1}


class NumpyLSTMModel:
    """The reference topology (bdb2026/models.py:24-66) as a pure-numpy
    forward pass: Masking(0.0) → LSTM(64, return_sequences) → LSTM(32,
    return_sequences) → TD Dense(16, relu) → TD Dense(1) — a GENUINE
    recurrent model, not a stand-in (dropout layers are identity at
    inference, so they do not appear).

    Gate math is Keras-compatible so real Keras weights drop in via
    :meth:`set_lstm_weights`: per step z = x·W + h·U + b split into
    (i, f, c̃, o) quarters, i/f/o sigmoid, c̃ tanh, c = f·c + i·c̃,
    h = o·tanh(c).  Masked (all-zero-feature) steps carry (h, c)
    unchanged and predict 0.0 — the Masking-layer contract
    (models.py:79-83).

    Init is deterministic (seeded Glorot-uniform kernels, orthogonal
    recurrent, unit forget bias — the Keras defaults made reproducible).
    :meth:`fit` trains the TimeDistributed HEAD by full-batch Adam on
    masked MSE with the recurrent features frozen: driver-side BPTT
    would add hundreds of lines for no engine value, while head-only
    training keeps the run deterministic and still reaches the
    reference's R² regime on the submission target (pinned in tests;
    quality anchor BDB_2026.ipynb#cell102, R²=0.9466).  The model
    pickles into the broadcast-inference seam unchanged."""

    def __init__(self, n_features: int, seed: int = 42,
                 units: tuple[int, ...] = (64, 32), head: int = 16):
        self.UNITS = tuple(units)
        self.HEAD = head
        rng = np.random.default_rng(seed)
        self.layers = []
        fan_in = n_features
        for units in self.UNITS:
            lim = np.sqrt(6.0 / (fan_in + units * 4))
            w = rng.uniform(-lim, lim, (fan_in, 4 * units))
            # orthogonal recurrent init, one QR per gate block
            u = np.concatenate([
                np.linalg.qr(rng.standard_normal((units, units)))[0]
                for _ in range(4)], axis=1)
            b = np.zeros(4 * units)
            b[units:2 * units] = 1.0  # unit_forget_bias
            self.layers.append([w, u, b])
            fan_in = units
        lim = np.sqrt(6.0 / (fan_in + self.HEAD))
        self.w1 = rng.uniform(-lim, lim, (fan_in, self.HEAD))
        self.b1 = np.zeros(self.HEAD)
        lim = np.sqrt(6.0 / (self.HEAD + 1))
        self.w2 = rng.uniform(-lim, lim, (self.HEAD, 1))
        self.b2 = np.zeros(1)

    def set_lstm_weights(self, layer: int, w: np.ndarray, u: np.ndarray,
                         b: np.ndarray) -> None:
        """Install (kernel, recurrent, bias) for LSTM ``layer`` in the
        Keras layout — (F, 4U), (U, 4U), (4U,), gate order i, f, c, o."""
        self.layers[layer] = [np.asarray(w, dtype=float),
                              np.asarray(u, dtype=float),
                              np.asarray(b, dtype=float)]

    @staticmethod
    def _sigmoid(z: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-z))

    def _recurrent_features(self, x: np.ndarray):
        """(N, T, F) → mask (N, T) and the second LSTM's hidden states
        (N, T, 32): the frozen feature map the head trains on."""
        x = np.asarray(x, dtype=np.float64)
        n, t, _ = x.shape
        mask = np.any(x != 0.0, axis=2)
        seq = x
        for w, u, b in self.layers:
            units = u.shape[0]
            h = np.zeros((n, units))
            c = np.zeros((n, units))
            out = np.zeros((n, t, units))
            for step in range(t):
                z = seq[:, step] @ w + h @ u + b
                i = self._sigmoid(z[:, :units])
                f = self._sigmoid(z[:, units:2 * units])
                g = np.tanh(z[:, 2 * units:3 * units])
                o = self._sigmoid(z[:, 3 * units:])
                c_new = f * c + i * g
                h_new = o * np.tanh(c_new)
                live = mask[:, step][:, None]
                c = np.where(live, c_new, c)
                h = np.where(live, h_new, h)
                out[:, step] = h
            seq = out
        return mask, seq

    def predict(self, x: np.ndarray) -> np.ndarray:
        """(N, T, F) float → (N, T) predictions; padded steps → 0.0."""
        mask, h2 = self._recurrent_features(x)
        hid = np.maximum(h2 @ self.w1 + self.b1, 0.0)
        pred = (hid @ self.w2 + self.b2)[..., 0]
        return np.where(mask, pred, 0.0).astype(np.float32)

    def fit(self, x: np.ndarray, y: np.ndarray, epochs: int = 300,
            lr: float = 1e-2) -> float:
        """Head-only full-batch Adam on masked MSE; returns final loss.
        Deterministic: fixed init, fixed epoch count, no minibatch
        shuffling."""
        mask, h2 = self._recurrent_features(x)
        feats = h2[mask]                       # (S, 32) valid steps only
        target = np.asarray(y, dtype=np.float64)[mask]
        params = [self.w1, self.b1, self.w2, self.b2]
        m = [np.zeros_like(p) for p in params]
        v = [np.zeros_like(p) for p in params]
        b1m, b2m, eps = 0.9, 0.999, 1e-8
        loss = float("inf")
        for step in range(1, epochs + 1):
            z1 = feats @ self.w1 + self.b1
            a1 = np.maximum(z1, 0.0)
            pred = (a1 @ self.w2 + self.b2)[:, 0]
            err = pred - target
            loss = float(np.mean(err ** 2))
            gpred = (2.0 / err.size) * err[:, None]
            gw2 = a1.T @ gpred
            gb2 = gpred.sum(axis=0)
            ga1 = (gpred @ self.w2.T) * (z1 > 0.0)
            gw1 = feats.T @ ga1
            gb1 = ga1.sum(axis=0)
            for p, g, mm, vv in zip(params, [gw1, gb1, gw2, gb2], m, v):
                mm += (1 - b1m) * (g - mm)
                vv += (1 - b2m) * (g * g - vv)
                mhat = mm / (1 - b1m ** step)
                vhat = vv / (1 - b2m ** step)
                p -= lr * mhat / (np.sqrt(vhat) + eps)
        return loss

    def get_weights(self):
        return {"lstm": self.layers,
                "head": [self.w1, self.b1, self.w2, self.b2]}


def train_sequence_model(seq_df: DataFrame, seq_col: str = "seq",
                         target_idx: int = 0, **fit_kw):
    """M6: collect the (small) tensor to the driver and train.  With
    Keras absent (this container), trains the pure-numpy LSTM — a real
    recurrent model with the reference topology — via head-only Adam;
    the Keras branch trains the full network when available."""
    rows = seq_df.select(seq_col).collect()  # ≈15 MB at reference scale
    x = np.asarray([[np.asarray(s, dtype=np.float32) for s in r[0]]
                    for r in rows], dtype=np.float32)
    y = x[:, :, target_idx]
    if not HAS_KERAS:
        model = NumpyLSTMModel(n_features=x.shape[2])
        model.fit(x, y, **fit_kw)
        return model
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
