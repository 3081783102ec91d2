"""Powerset <-> multilabel segmentation conversion.

Equivalent of the powerset adaptation the reference applies to
``pyannote/segmentation-3.0``-style models
(``/root/reference/src/diart/models.py:29-39``): the model classifies each
frame into one of the subsets of up to ``max_simultaneous`` speakers; the
adapter converts the argmax class back into per-speaker binary labels.

Class ordering matches pyannote's ``Powerset``: subsets enumerated by
increasing cardinality, lexicographic within a cardinality —
e.g. K=3, max 2: [{}, {0}, {1}, {2}, {0,1}, {0,2}, {1,2}].
"""

from __future__ import annotations

from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["powerset_mapping", "to_multilabel", "num_powerset_classes"]


def powerset_mapping(num_speakers: int, max_simultaneous: int) -> np.ndarray:
    """(num_classes, num_speakers) binary matrix: class -> speaker set."""
    rows = []
    for size in range(max_simultaneous + 1):
        for subset in combinations(range(num_speakers), size):
            row = np.zeros(num_speakers, dtype=np.float32)
            row[list(subset)] = 1.0
            rows.append(row)
    return np.stack(rows)


def num_powerset_classes(num_speakers: int, max_simultaneous: int) -> int:
    return powerset_mapping(num_speakers, max_simultaneous).shape[0]


def to_multilabel(
    powerset_scores: jnp.ndarray, mapping: np.ndarray, soft: bool = False
) -> jnp.ndarray:
    """Convert powerset class scores to per-speaker activations.

    Parameters
    ----------
    powerset_scores: (..., frames, num_classes) log-probabilities or logits.
    mapping: from :func:`powerset_mapping`.
    soft: if True, marginalize probabilities instead of hard argmax
        (the reference uses hard argmax via pyannote's
        ``Powerset.to_multilabel``).

    Returns
    -------
    (..., frames, num_speakers) activations in [0, 1].
    """
    mapping = jnp.asarray(mapping)
    if soft:
        # scores must be LOG-PROBABILITIES (the PyanNet powerset head's
        # LogSoftmax output) — exp of raw logits would be unnormalized
        # and the marginals unbounded; normalize defensively so either
        # input yields true per-class probabilities
        probs = jax.nn.softmax(powerset_scores, axis=-1)
        return jnp.matmul(probs, mapping)
    # Gather-free hard decode: one-hot of the argmax contracted with the
    # mapping runs on the TPU vector/matrix units inside the jitted engine
    # step (a mapping[best] gather would route through the scalar core).
    best = jnp.argmax(powerset_scores, axis=-1)
    onehot = jax.nn.one_hot(best, mapping.shape[0], dtype=mapping.dtype)
    return jnp.matmul(onehot, mapping)
