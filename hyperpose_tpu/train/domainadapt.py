"""Domain-adaptation discriminator.

(reference: hyperpose/Model/domainadapt.py:12-51 Discriminator and the
adversarial g/d losses wired into the train loop at Model/train.py:230-262).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class Discriminator(nn.Module):
    """5 conv layers + 3 FC over backbone features -> real/fake logit."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats
        for i, (f, s) in enumerate(
            [(512, 1), (256, 2), (128, 2), (64, 2), (32, 2)]
        ):
            x = nn.leaky_relu(nn.Conv(
                f, (3, 3), strides=(s, s), padding="SAME", dtype=self.dtype,
                name=f"conv{i}",
            )(x), 0.2)
        x = x.reshape((x.shape[0], -1))
        x = nn.leaky_relu(nn.Dense(128, dtype=self.dtype, name="fc1")(x), 0.2)
        x = nn.leaky_relu(nn.Dense(32, dtype=self.dtype, name="fc2")(x), 0.2)
        return nn.Dense(1, dtype=self.dtype, name="fc3")(x)[:, 0]


def bce_logits(logits, labels):
    z = jnp.clip(logits, -30, 30)
    return jnp.mean(
        jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
    )


def discriminator_losses(
    labeled_logits: jax.Array, unlabeled_logits: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(g_loss, d_loss): discriminator separates labeled (1) from unlabeled
    (0) backbone features; the generator (backbone) is pushed to make
    unlabeled features look labeled (reference: domainadapt.py cal_loss)."""
    d_loss = 0.5 * (
        bce_logits(labeled_logits, jnp.ones_like(labeled_logits))
        + bce_logits(unlabeled_logits, jnp.zeros_like(unlabeled_logits))
    )
    g_loss = bce_logits(unlabeled_logits, jnp.ones_like(unlabeled_logits))
    return g_loss, d_loss
