from .functional import (
    cosine_cdist,
    min_max_normalize,
    normalize_embeddings,
    overlapped_speech_penalty,
)
from .assignment import assign_rows, assign_rows_host
from .clustering import ClusteringParams, ClusteringState, cluster_step, init_state
from .aggregation import AggregationGeometry, aggregate, build_geometry
from .binarize import binarize
from .resample import resample

__all__ = [
    "overlapped_speech_penalty",
    "normalize_embeddings",
    "cosine_cdist",
    "min_max_normalize",
    "assign_rows",
    "assign_rows_host",
    "ClusteringParams",
    "ClusteringState",
    "cluster_step",
    "init_state",
    "AggregationGeometry",
    "aggregate",
    "build_geometry",
    "binarize",
    "resample",
]
