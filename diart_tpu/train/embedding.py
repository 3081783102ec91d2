"""Speaker-embedding training with additive-angular-margin softmax.

The reference serves pre-trained embedding models only
(``/root/reference/src/diart/models.py:201-265``); this module adds the
standard discriminative training objective of those models' recipes
(ArcFace/AAM-softmax — x-vector, ECAPA and wespeaker ResNet are all trained
this way): embeddings and per-class prototypes are L2-normalized, the target
class's angle gets an additive margin, and the scaled cosine logits feed a
cross-entropy. Data-parallel over a ``jax.sharding.Mesh`` exactly like the
segmentation trainer — shard the batch, replicate parameters, and XLA
inserts the gradient all-reduce over ICI.

The classifier prototype matrix is trained alongside the model parameters
and discarded at serving time (only the embedding trunk/head ship).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from .segmentation import TrainState

__all__ = ["aam_softmax_loss", "make_embedding_train_state", "embedding_train_step"]


def aam_softmax_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    prototypes: jnp.ndarray,
    margin: float = 0.2,
    scale: float = 30.0,
) -> jnp.ndarray:
    """Additive angular margin softmax (ArcFace).

    Parameters
    ----------
    embeddings: (batch, dim).
    labels: (batch,) int class ids.
    prototypes: (num_classes, dim) class prototype matrix.
    margin: additive angle margin (radians) applied to the target class.
    scale: logit scale after margin insertion.
    """
    emb = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12
    )
    protos = prototypes / jnp.maximum(
        jnp.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.clip(emb @ protos.T, -1.0, 1.0)  # (B, C)
    # cos(theta + m) via the angle-sum identity (no arccos: its gradient is
    # singular at |cos| = 1, which NaNs training once embeddings align)
    sin = jnp.sqrt(jnp.clip(1.0 - cos**2, 1e-12, 1.0))
    cos_m, sin_m = jnp.cos(margin), jnp.sin(margin)
    phi = cos * cos_m - sin * sin_m
    # past pi - m the margined angle wraps; fall back to the linear penalty
    # (standard ArcFace "hard example" handling)
    phi = jnp.where(cos > jnp.cos(jnp.pi - margin), phi, cos - margin * sin_m)
    onehot = jax.nn.one_hot(labels, prototypes.shape[0], dtype=cos.dtype)
    logits = scale * (onehot * phi + (1.0 - onehot) * cos)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


def make_embedding_train_state(
    model_params,
    num_classes: int,
    embedding_dim: int,
    learning_rate: float = 1e-4,
    seed: int = 0,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Train state over (model params, class prototypes)."""
    prototypes = (
        jax.random.normal(jax.random.PRNGKey(seed), (num_classes, embedding_dim))
        / jnp.sqrt(embedding_dim)
    )
    params = {"model": model_params, "prototypes": prototypes}
    tx = optax.adamw(learning_rate)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def embedding_train_step(
    embed_fn: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    waveforms: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.2,
    scale: float = 30.0,
) -> Tuple[TrainState, jnp.ndarray]:
    """One SGD step.

    embed_fn: (model_params, waveforms (B, 1, S)) -> (B, dim) — e.g.
        ``lambda p, w: model.apply(p, w)`` (uniform pooling weights).
    waveforms: (batch, 1, samples); labels: (batch,) speaker ids.
    Jit with the batch and labels sharded over a mesh 'dp'/'streams' axis
    and parameters replicated; XLA inserts the gradient all-reduce.
    """

    def loss_fn(params):
        emb = embed_fn(params["model"], waveforms)
        return aam_softmax_loss(
            emb, labels, params["prototypes"], margin=margin, scale=scale
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
