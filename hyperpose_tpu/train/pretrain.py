"""Backbone ImageNet pretraining.

(reference: hyperpose/Model/pretrain.py:39-170 single_pretrain/single_val and
Dataset/imagenet_dataset/dataset.py:5-80 folder-label dataset).
"""
from __future__ import annotations

import logging
import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from .checkpoint import CheckpointManager
from .metrics import MetricManager

logger = logging.getLogger("hyperpose_tpu.TRAIN")


class ImagenetDataset:
    """Folder-per-class image dataset
    (reference: Dataset/imagenet_dataset/dataset.py). Expects
    <root>/<class_name>/*.JPEG; class ids assigned by sorted folder name."""

    def __init__(self, root: str, image_size: int = 224):
        self.root = root
        self.image_size = image_size
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.samples: list[tuple[str, int]] = []
        for ci, cname in enumerate(self.classes):
            cdir = os.path.join(root, cname)
            for fname in os.listdir(cdir):
                self.samples.append((os.path.join(cdir, fname), ci))

    def batches(
        self, batch_size: int, rng: np.random.Generator, train: bool = True
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        import cv2

        order = rng.permutation(len(self.samples))
        s = self.image_size
        for i in range(0, len(order) - batch_size + 1, batch_size):
            imgs = np.zeros((batch_size, s, s, 3), np.float32)
            labels = np.zeros((batch_size,), np.int32)
            for j, idx in enumerate(order[i:i + batch_size]):
                path, label = self.samples[idx]
                img = cv2.imread(path)
                if img is None:
                    continue
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                if train:
                    # random resized crop light variant
                    h, w = img.shape[:2]
                    scale = s / min(h, w)
                    img = cv2.resize(
                        img, (int(w * scale) + 1, int(h * scale) + 1)
                    )
                    oy = rng.integers(0, img.shape[0] - s + 1)
                    ox = rng.integers(0, img.shape[1] - s + 1)
                    img = img[oy:oy + s, ox:ox + s]
                    if rng.random() < 0.5:
                        img = img[:, ::-1]
                else:
                    img = cv2.resize(img, (s, s))
                imgs[j] = img / 255.0
                labels[j] = label
            yield imgs, labels


def _topk_acc(logits: np.ndarray, labels: np.ndarray, k: int) -> float:
    topk = np.argsort(-logits, axis=-1)[:, :k]
    return float(np.mean([l in t for l, t in zip(labels, topk)]))


def single_pretrain(
    backbone_cls, config: Config, dataset: ImagenetDataset | None = None,
    n_step: int | None = None,
):
    """Classification pretraining with top1/top5 tracking and lr/5 decay
    (reference: Model/pretrain.py:39-170)."""
    p = config.pretrain
    dataset = dataset or ImagenetDataset(p.pretrain_dataset_path)
    model = backbone_cls(pretraining=True)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 224, 224, 3))
    variables = model.init(rng, dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    sched = optax.exponential_decay(
        p.lr_init, p.lr_decay_step, 1 / 5.0, staircase=True
    )
    tx = optax.chain(
        optax.add_decayed_weights(p.weight_decay_factor),
        optax.sgd(sched, momentum=0.9),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(pp):
            logits, updates = model.apply(
                {"params": pp, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels
                )
            )
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, logits

    mm = MetricManager()
    ckpt = CheckpointManager(p.pretrain_model_dir)
    nrng = np.random.default_rng(0)
    total = n_step or p.total_step
    step_idx = 0
    while step_idx < total:
        for images, labels in dataset.batches(p.batch_size, nrng):
            params, batch_stats, opt_state, loss, logits = step(
                params, batch_stats, opt_state,
                jnp.asarray(images), jnp.asarray(labels),
            )
            step_idx += 1
            if step_idx % p.log_interval == 0:
                ln = np.asarray(logits)
                mm.update("pretrain/loss", float(loss))
                mm.update("pretrain/top1", _topk_acc(ln, labels, 1))
                mm.update("pretrain/top5", _topk_acc(ln, labels, 5))
                logger.info("pretrain step %d: %s", step_idx, mm.report_train())
            if step_idx % p.save_interval == 0:
                ckpt.save(step_idx, {
                    "params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats),
                })
            if step_idx >= total:
                break
    return params, batch_stats
