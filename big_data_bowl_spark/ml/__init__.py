from .clustering import (
    centroid_distance_score,
    cluster_centroids,
    fit_route_clusters,
    one_hot_labels,
    pca_2d,
)
from .lstm import (
    EmaFallbackModel,
    NumpyLSTMModel,
    eval_predictions,
    predict_sequences,
    train_sequence_model,
)
from .split import group_split

__all__ = [
    "centroid_distance_score", "cluster_centroids", "fit_route_clusters",
    "one_hot_labels", "pca_2d",
    "EmaFallbackModel", "NumpyLSTMModel", "eval_predictions",
    "predict_sequences",
    "train_sequence_model",
    "group_split",
]
