"""Backbone ImageNet-pretrain loop (reference: Model/pretrain.py:39-170).

Executes single_pretrain for real on the synthetic shape/color
classification twin: loss must fall and top1 must beat chance; the
stuck-val and scheduled lr/5 decay branches are driven deterministically;
the exported newest_<Backbone>.npz grafts into a family model through the
Trainer's pretrained-backbone load (reference: Model/train.py:191-195).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.synthetic import generate_synthetic_imagenet
from hyperpose_tpu.models.backbones import VggTiny
from hyperpose_tpu.train.pretrain import (
    ImagenetDataset, load_imagenet_splits, load_pretrained_backbone,
    single_pretrain, single_val,
)

N_CLASSES = 4
SIZE = 48


@pytest.fixture(scope="module")
def imagenet_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthin"))
    generate_synthetic_imagenet(
        root, n_classes=N_CLASSES, n_train_per_class=12, n_val_per_class=4,
        size=SIZE, seed=3,
    )
    return root


def _pretrain_config(tmp_path, **over):
    Config.reset()
    Config.set_pretrain(True)
    defaults = dict(
        batch_size=8, lr_init=1e-3, log_interval=5, val_interval=10**6,
        save_interval=10**6, lr_decay_step=10**6, val_num=64,
        pretrain_model_dir=str(tmp_path / "pre"),
    )
    defaults.update(over)
    for k, v in defaults.items():
        Config._set("pretrain", k, v)
    return Config.get_config(create_dirs=False)


def test_single_pretrain_learns(imagenet_root, tmp_path):
    config = _pretrain_config(tmp_path)
    train_ds, val_ds = load_imagenet_splits(imagenet_root, image_size=SIZE)
    assert len(train_ds.samples) == N_CLASSES * 12
    assert val_ds is not None and len(val_ds.samples) == N_CLASSES * 4

    params, batch_stats, history = single_pretrain(
        VggTiny, config, dataset=train_ds, val_dataset=val_ds, n_step=40,
    )
    first, last = history["log"][0], history["log"][-1]
    assert last["loss"] < first["loss"], history["log"]
    # 4-way shape/color classes: must beat chance (0.25) within 40 steps
    assert last["top1"] > 0.4, history["log"]

    # top1/top5 validation loop (reference: single_val, pretrain.py:144-170)
    v = single_val(
        VggTiny(pretraining=True), params, batch_stats, val_ds, config,
        batch_size=8,
    )
    assert v["n"] == N_CLASSES * 4
    assert v["top5"] >= v["top1"] > 0.3, v

    # backbone npz exported for the finetune path
    npz = os.path.join(config.pretrain.pretrain_model_dir,
                       "newest_VggTiny.npz")
    assert os.path.exists(npz)

    # graft into the family model: Trainer.init_state must pick it up
    from hyperpose_tpu.train.trainer import Trainer

    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    Config.set_model_inout(hin=64, win=64, hout=8, wout=8)
    Config._set("pretrain", "pretrain_model_dir",
                config.pretrain.pretrain_model_dir)
    Config._set("model", "model_dir", str(tmp_path / "ft"))
    cfg2 = Config.get_config(create_dirs=True)

    from hyperpose_tpu.models import get_model, get_topology

    model = get_model(cfg2)
    topo = get_topology(cfg2)
    trainer = Trainer(cfg2, model, topo.limbs)
    p2, bs2, _ = trainer.init_state()

    # the grafted backbone conv must equal the pretrained tensor, not init
    got = np.asarray(
        jax.tree.leaves(p2["backbone"]["block_0"])[0]
    )
    from hyperpose_tpu.train.checkpoint import load_npz_tree

    pre = load_npz_tree(npz)
    want = np.asarray(jax.tree.leaves(pre["params"]["block_0"])[0])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_load_pretrained_backbone_tolerates_mismatch(imagenet_root, tmp_path):
    """The pretraining variant has scale-32 blocks + fc head with no
    counterpart in the scale-8 family backbone: graft must copy the
    intersection only."""
    config = _pretrain_config(tmp_path, batch_size=4)
    train_ds, _ = load_imagenet_splits(imagenet_root, image_size=SIZE)
    single_pretrain(VggTiny, config, dataset=train_ds, n_step=1)
    npz = os.path.join(config.pretrain.pretrain_model_dir,
                       "newest_VggTiny.npz")

    from hyperpose_tpu.models.openpose import LightWeightOpenPose

    model = LightWeightOpenPose(backbone=VggTiny)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    before = np.asarray(
        jax.tree.leaves(variables["params"]["backbone"]["block_0"])[0]
    ).copy()
    grafted, n = load_pretrained_backbone(variables, npz)
    assert n > 0
    after = np.asarray(
        jax.tree.leaves(grafted["params"]["backbone"]["block_0"])[0]
    )
    assert not np.allclose(before, after), "graft did not copy backbone convs"
    # heads (cpm/init stage) untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(variables["params"]["cpm"])[0])
        if "cpm" in variables["params"] else 0,
        np.asarray(jax.tree.leaves(grafted["params"]["cpm"])[0])
        if "cpm" in grafted["params"] else 0,
    )


def test_stuck_val_lr_decay(imagenet_root, tmp_path):
    """3 consecutive non-improving validations -> lr/5, counter reset
    (reference: pretrain.py:126-142)."""
    config = _pretrain_config(tmp_path, val_interval=1, log_interval=10**6)
    train_ds, _ = load_imagenet_splits(imagenet_root, image_size=SIZE)

    accs = iter([0.5, 0.4, 0.4, 0.4, 0.45, 0.3])

    def scripted_val(model, params, batch_stats):
        return {"top1": next(accs), "top5": 1.0, "n": 1}

    _, _, history = single_pretrain(
        VggTiny, config, dataset=train_ds, n_step=6, val_fn=scripted_val,
    )
    # acc 0.5 sets max; 0.4,0.4,0.4 -> stuck=3 -> decay at step 4; 0.45
    # still < max -> stuck=1; 0.3 -> stuck=2 (no second decay)
    assert history["lr_events"] == [("stuck_val", 4)], history
    assert history["val"][0]["top1"] == 0.5
    assert history["val"][-1]["top1"] == pytest.approx(0.3)


def test_scheduled_lr_decay(imagenet_root, tmp_path):
    config = _pretrain_config(tmp_path, lr_decay_step=2, log_interval=1)
    train_ds, _ = load_imagenet_splits(imagenet_root, image_size=SIZE)
    _, _, history = single_pretrain(
        VggTiny, config, dataset=train_ds, n_step=4,
    )
    assert [e for e in history["lr_events"] if e[0] == "schedule"] == [
        ("schedule", 2), ("schedule", 4),
    ]
    lrs = [row["lr"] for row in history["log"]]
    # decay precedes logging within a step: step-2 row already shows /5
    assert lrs[0] == pytest.approx(1e-3)
    assert lrs[1] == pytest.approx(1e-3 / 5)
    assert lrs[2] == pytest.approx(1e-3 / 5)
    assert lrs[3] == pytest.approx(1e-3 / 25)
