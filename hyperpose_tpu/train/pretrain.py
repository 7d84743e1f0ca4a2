"""Backbone ImageNet pretraining.

(reference: hyperpose/Model/pretrain.py:39-170 single_pretrain/single_val and
Dataset/imagenet_dataset/dataset.py:5-80 folder-label dataset). Matches the
reference protocol: Adam, lr/5 on the step schedule AND on 3 consecutive
non-improving validations (the "stuck-val" branch), periodic top1/top5
validation, npz backbone export consumed by the Trainer's
pretrained-backbone load.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from .checkpoint import CheckpointManager, save_weights_npz
from .metrics import MetricManager

logger = logging.getLogger("hyperpose_tpu.TRAIN")


class ImagenetDataset:
    """Folder-per-class image dataset
    (reference: Dataset/imagenet_dataset/dataset.py). Expects
    <root>/<class_name>/*.JPEG; class ids assigned by sorted folder name.
    `classes` may be passed to pin the id assignment (so a val split uses
    the train split's ids even if a class folder is missing)."""

    def __init__(self, root: str, image_size: int = 224,
                 classes: list[str] | None = None):
        self.root = root
        self.image_size = image_size
        self.classes = classes if classes is not None else sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.samples: list[tuple[str, int]] = []
        for ci, cname in enumerate(self.classes):
            cdir = os.path.join(root, cname)
            if not os.path.isdir(cdir):
                continue
            for fname in sorted(os.listdir(cdir)):
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


def load_imagenet_splits(
    root: str, image_size: int = 224
) -> tuple[ImagenetDataset, ImagenetDataset | None]:
    """(train, val) datasets. A pre-split layout <root>/{train,val}/<class>/
    is used when present; otherwise <root>/<class>/ with no val split."""
    tdir = os.path.join(root, "train")
    vdir = os.path.join(root, "val")
    if os.path.isdir(tdir):
        train = ImagenetDataset(tdir, image_size)
        val = ImagenetDataset(vdir, image_size, classes=train.classes) \
            if os.path.isdir(vdir) else None
        return train, val
    return ImagenetDataset(root, image_size), None


def _topk_acc(logits: np.ndarray, labels: np.ndarray, k: int) -> float:
    topk = np.argsort(-logits, axis=-1)[:, :k]
    return float(np.mean([l in t for l, t in zip(labels, topk)]))


def single_val(
    model, params, batch_stats, dataset: ImagenetDataset, config: Config,
    batch_size: int = 64,
) -> dict[str, float]:
    """Validation top1/top5 (reference: Model/pretrain.py:144-170)."""
    p = config.pretrain

    @jax.jit
    def forward(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=False,
        ).astype(jnp.float32)

    rng = np.random.default_rng(1)
    bs = min(batch_size, len(dataset.samples))
    top1 = top5 = n = 0
    for images, labels in dataset.batches(bs, rng, train=False):
        logits = np.asarray(forward(params, batch_stats, jnp.asarray(images)))
        top1 += _topk_acc(logits, labels, 1) * len(labels)
        top5 += _topk_acc(logits, labels, 5) * len(labels)
        n += len(labels)
        if n >= p.val_num:
            break
    if n == 0:
        return {"top1": 0.0, "top5": 0.0, "n": 0}
    return {"top1": top1 / n, "top5": top5 / n, "n": n}


def _opt_lr(opt_state) -> float:
    """Current Adam lr from the inject_hyperparams state."""
    return float(opt_state[1].hyperparams["learning_rate"])


def _opt_with_lr(opt_state, lr: float):
    inner = opt_state[1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return (opt_state[0], inner._replace(hyperparams=hp))


def single_pretrain(
    backbone_cls, config: Config, dataset: ImagenetDataset | None = None,
    val_dataset: ImagenetDataset | None = None, n_step: int | None = None,
    val_fn: Callable[..., dict] | None = None,
):
    """Classification pretraining with top1/top5 tracking and lr/5 decay on
    BOTH the step schedule and 3 stuck validations
    (reference: Model/pretrain.py:39-142: `if step % lr_decay_step == 0:
    lr = lr/5` and `if stuck_time >= 3: lr = lr/5`). Saves orbax ckpt +
    newest_<Backbone>.npz for the Trainer's pretrained-backbone load.

    `val_fn(model, params, batch_stats) -> {"top1": ...}` overrides the
    validation call (tests script it to drive the stuck branch
    deterministically). Returns (params, batch_stats, history) where
    history records logged loss/top1 and lr-decay events.
    """
    p = config.pretrain
    if dataset is None:
        dataset, val_dataset = load_imagenet_splits(p.pretrain_dataset_path)
    model = backbone_cls(pretraining=True)
    rng = jax.random.PRNGKey(0)
    s = dataset.image_size
    dummy = jnp.zeros((1, s, s, 3))
    variables = model.init(rng, dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # Adam with a runtime-mutable lr (the stuck-val branch cannot be a
    # static optax schedule); weight decay matches the reference's
    # regulize_loss L2 term.
    tx = optax.chain(
        optax.add_decayed_weights(p.weight_decay_factor),
        optax.inject_hyperparams(optax.adam)(learning_rate=p.lr_init),
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
    history = {"log": [], "lr_events": [], "val": []}

    step_idx = 0
    restored_step, restored = ckpt.restore({
        "params": params, "batch_stats": batch_stats, "opt_state": opt_state,
    })
    if restored is not None:
        step_idx = restored_step
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
        logger.info("pretrain resumed from step %d", step_idx)

    max_eval_acc, stuck_time = 0.0, 0
    npz_path = os.path.join(
        p.pretrain_model_dir, f"newest_{backbone_cls.__name__}.npz"
    )

    def save(step_i):
        ckpt.save(step_i, {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "opt_state": jax.device_get(opt_state),
        })
        save_weights_npz(
            {"params": jax.device_get(params),
             "batch_stats": jax.device_get(batch_stats)},
            npz_path,
        )
        logger.info("pretrain saved step %d -> %s", step_i, npz_path)

    while step_idx < total:
        for images, labels in dataset.batches(p.batch_size, nrng):
            params, batch_stats, opt_state, loss, logits = step(
                params, batch_stats, opt_state,
                jnp.asarray(images), jnp.asarray(labels),
            )
            step_idx += 1
            # scheduled lr/5 (reference: pretrain.py:106-107)
            if step_idx % p.lr_decay_step == 0:
                opt_state = _opt_with_lr(opt_state, _opt_lr(opt_state) / 5.0)
                history["lr_events"].append(("schedule", step_idx))
            if step_idx % p.log_interval == 0:
                ln = np.asarray(logits)
                mm.update("pretrain/loss", float(loss))
                mm.update("pretrain/top1", _topk_acc(ln, labels, 1))
                mm.update("pretrain/top5", _topk_acc(ln, labels, 5))
                row = {"step": step_idx, "lr": _opt_lr(opt_state),
                       "loss": float(loss),
                       "top1": _topk_acc(ln, labels, 1)}
                history["log"].append(row)
                logger.info("pretrain step %d (lr %.2e): %s", step_idx,
                            row["lr"], mm.report_train())
            if step_idx % p.save_interval == 0:
                save(step_idx)
            # stuck-val lr/5 decay (reference: pretrain.py:126-142)
            if step_idx % p.val_interval == 0 and (
                val_fn is not None or val_dataset is not None
            ):
                if val_fn is not None:
                    v = val_fn(model, params, batch_stats)
                else:
                    v = single_val(
                        model, params, batch_stats, val_dataset, config
                    )
                acc = v["top1"]
                history["val"].append({"step": step_idx, **v})
                if acc < max_eval_acc:
                    stuck_time += 1
                else:
                    max_eval_acc = acc
                logger.info(
                    "pretrain val step %d: top1=%.4f max=%.4f stuck=%d",
                    step_idx, acc, max_eval_acc, stuck_time,
                )
                if stuck_time >= 3:
                    opt_state = _opt_with_lr(
                        opt_state, _opt_lr(opt_state) / 5.0
                    )
                    history["lr_events"].append(("stuck_val", step_idx))
                    stuck_time = 0
            if step_idx >= total:
                break
    save(step_idx)
    return params, batch_stats, history


def load_pretrained_backbone(variables: dict, npz_path: str) -> tuple[dict, int]:
    """Graft a pretrain checkpoint (newest_<Backbone>.npz) into a family
    model's `backbone` submodule (reference: Model/train.py:191-195
    train_model.backbone.load_weight(pretrain_model_path)). Tolerant: only
    same-path same-shape leaves copy (the pretraining variant has extra
    scale-32 blocks and fc head params that have no counterpart here).
    Returns (variables, n_copied)."""
    from .checkpoint import load_npz_tree

    pre = load_npz_tree(npz_path)
    n_copied = 0

    def graft(dst: dict, src: dict) -> int:
        n = 0
        for k, v in dst.items():
            if k not in src:
                continue
            if isinstance(v, dict):
                n += graft(v, src[k])
            elif np.shape(src[k]) == np.shape(v):
                dst[k] = jnp.asarray(src[k], v.dtype)
                n += 1
        return n

    out = jax.tree.map(lambda x: x, variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        if col in out and "backbone" in out[col] and col in pre:
            n_copied += graft(out[col]["backbone"], pre[col])
    return out, n_copied
