"""Core tensor math, as pure jittable functions.

TPU-native reimplementation of the reference's two core equations
(``/root/reference/src/diart/functional.py:6-27``) plus the distance math the
clustering layer needs. Everything here is shape-polymorphic, jit/vmap-safe
and free of host synchronization.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

__all__ = [
    "overlapped_speech_penalty",
    "normalize_embeddings",
    "cosine_cdist",
    "min_max_normalize",
]


def overlapped_speech_penalty(
    segmentation: jnp.ndarray, gamma: float = 3.0, beta: float = 10.0
) -> jnp.ndarray:
    """Overlapped-speech penalty weights (paper Eq. 2).

    ``w = seg**gamma * softmax(beta * seg, axis=-1)**gamma`` clamped to a
    minimum of ``1e-8`` (reference ``functional.py:6-13``). The softmax over
    the speaker axis suppresses frames where several speakers are jointly
    active; the power ``gamma`` suppresses low-confidence frames.

    Parameters
    ----------
    segmentation: (..., frames, speakers) array of activation probabilities.

    Returns
    -------
    weights: same shape, in [1e-8, 1].
    """
    probs = jax.nn.softmax(beta * segmentation, axis=-1)
    weights = jnp.power(segmentation, gamma) * jnp.power(probs, gamma)
    return jnp.maximum(weights, 1e-8)


def normalize_embeddings(
    embeddings: jnp.ndarray, norm: Union[float, jnp.ndarray] = 1.0
) -> jnp.ndarray:
    """Scale embeddings to a target L2 norm (reference ``functional.py:16-27``).

    Parameters
    ----------
    embeddings: (..., speakers, feat)
    norm: scalar or broadcastable array of target norms.
    """
    if embeddings.ndim == 2:
        # (speakers, feat) -> (1, speakers, feat), as the reference does
        # (functional.py:20-21) — its embedding block squeezes the batch
        # dim away for single chunks and normalization restores it
        embeddings = embeddings[None]
    emb_norm = jnp.linalg.norm(embeddings, ord=2, axis=-1, keepdims=True)
    return norm * embeddings / emb_norm


def cosine_cdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine distances ``1 - cos(x_i, y_j)``.

    Equivalent of ``scipy.spatial.distance.cdist(x, y, metric="cosine")`` used
    by the reference's speaker mapping (``mapping.py:170-176``). Computed as a
    single MXU matmul on normalized rows.

    Parameters
    ----------
    x: (n, d), y: (m, d)

    Returns
    -------
    dist: (n, m)
    """
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    sim = jnp.dot(
        xn,
        yn.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return 1.0 - sim


def min_max_normalize(weights: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Min-max normalize along ``axis``; NaNs (flat inputs) become 1e-8.

    Mirrors the optional weight normalization in the reference's
    ``OverlappedSpeechPenalty`` (``blocks/embedding.py:102-106``).
    """
    min_v = jnp.min(weights, axis=axis, keepdims=True)
    max_v = jnp.max(weights, axis=axis, keepdims=True)
    out = (weights - min_v) / (max_v - min_v)
    return jnp.nan_to_num(out, nan=1e-8, posinf=1e-8, neginf=1e-8)
