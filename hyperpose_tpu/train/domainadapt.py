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


class UnlabeledPipeline:
    """Background loader of augmented unlabeled image batches
    (reference: Dataset/dmadapt_dataset.py + train.py:292-295)."""

    def __init__(self, image_paths, augmentor, batch_size: int,
                 n_workers: int = 1, prefetch: int = 2, seed: int = 0):
        import queue
        import threading

        import numpy as np

        self.paths = list(image_paths)
        self.augmentor = augmentor
        self.batch_size = batch_size
        self._q = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()

        def worker(wid):
            import cv2

            rng = np.random.default_rng(seed + wid)
            while not self._stop.is_set():
                batch = np.zeros(
                    (batch_size, augmentor.hin, augmentor.win, 3), np.uint8
                )
                count = 0
                while count < batch_size and not self._stop.is_set():
                    path = self.paths[int(rng.integers(len(self.paths)))]
                    img = cv2.imread(path)
                    if img is None:
                        continue
                    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                    self.augmentor.rng = rng
                    batch[count] = self.augmentor.process_only_image(img)
                    count += 1
                try:
                    self._q.put(batch, timeout=1.0)
                except queue.Full:
                    continue

        for wid in range(n_workers):
            threading.Thread(target=worker, args=(wid,), daemon=True).start()

    def next(self):
        return self._q.get()

    def stop(self):
        self._stop.set()


def make_domainadapt_extension(model, discriminator, d_optimizer,
                               lambda_adapt: float = 1.0):
    """Returns (g_loss_fn, d_step_fn) to bolt onto a pose train step
    (reference: Model/train.py:230-262,475-507 optimize_step_dmadapt).

    g_loss_fn(params, batch_stats, d_params, unlabeled_x) -> generator loss
    encouraging unlabeled backbone features to fool the discriminator;
    d_step_fn updates the discriminator on (labeled, unlabeled) features.
    """
    import jax
    import jax.numpy as jnp
    import optax

    def features(params, batch_stats, x):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=False, ret_backbone=True,
        )
        return out["backbone_features"].astype(jnp.float32)

    def g_loss_fn(params, batch_stats, d_params, unlabeled_x):
        feats = features(params, batch_stats, unlabeled_x)
        logits = discriminator.apply({"params": d_params}, feats)
        return lambda_adapt * bce_logits(logits, jnp.ones_like(logits))

    @jax.jit
    def d_step_fn(d_params, d_opt_state, labeled_feats, unlabeled_feats):
        def loss(dp):
            ll = discriminator.apply({"params": dp}, labeled_feats)
            ul = discriminator.apply({"params": dp}, unlabeled_feats)
            _, d_loss = discriminator_losses(ll, ul)
            return d_loss

        d_loss, grads = jax.value_and_grad(loss)(d_params)
        updates, d_opt_state = d_optimizer.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, d_loss

    return g_loss_fn, d_step_fn
