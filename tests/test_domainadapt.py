"""Domain-adaptation discriminator + adversarial extension."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.train.domainadapt import (
    Discriminator, discriminator_losses, make_domainadapt_extension,
)


def test_discriminator_shapes_and_losses():
    disc = Discriminator()
    feats = jnp.zeros((2, 8, 8, 128))
    variables = disc.init(jax.random.PRNGKey(0), feats)
    logits = disc.apply(variables, feats)
    assert logits.shape == (2,)
    g, d = discriminator_losses(jnp.array([2.0, 3.0]), jnp.array([-2.0]))
    assert float(d) < 0.2  # well separated -> low d loss
    assert float(g) > 1.0  # generator loss high when unlabeled detected


def test_domainadapt_extension_steps():
    model = LightWeightOpenPose(dtype=jnp.float32)
    hw = (32, 32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=True
    )
    params, stats = variables["params"], variables["batch_stats"]

    disc = Discriminator()
    feats_shape = model.apply(
        variables, jnp.zeros((1, *hw, 3)), train=False, ret_backbone=True
    )["backbone_features"].shape
    d_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros(feats_shape))
    d_params = d_vars["params"]
    d_opt = optax.adam(1e-4)
    d_state = d_opt.init(d_params)

    g_loss_fn, d_step_fn = make_domainadapt_extension(model, disc, d_opt)
    unlabeled = jnp.asarray(
        np.random.default_rng(0).random((2, *hw, 3)).astype(np.float32)
    )
    g_loss = g_loss_fn(params, stats, d_params, unlabeled)
    assert np.isfinite(float(g_loss))
    # g_loss is differentiable w.r.t. the pose model params
    grads = jax.grad(
        lambda p: g_loss_fn(p, stats, d_params, unlabeled)
    )(params)
    assert max(
        float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)
    ) > 0

    feats = model.apply(
        {"params": params, "batch_stats": stats}, unlabeled,
        train=False, ret_backbone=True,
    )["backbone_features"]
    d_params2, d_state2, d_loss = d_step_fn(
        d_params, d_state, feats, feats + 0.5
    )
    assert np.isfinite(float(d_loss))


def test_trainer_domainadapt_integration(tmp_path):
    """Full adversarial step inside the Trainer: pose + generator loss fused,
    discriminator updated, both checkpointed
    (reference: Model/train.py:230-262,475-507)."""
    import os

    import cv2

    from hyperpose_tpu import config as C
    from hyperpose_tpu.data.augment import MISSING, BasicAugmentor
    from hyperpose_tpu.data.base import TrainRecord
    from hyperpose_tpu.data.pipeline import TrainPipeline
    from hyperpose_tpu.train.trainer import Trainer
    from hyperpose_tpu.utils.topology import COCO_FLIP_LIST, COCO_LIMBS

    C.reset()
    C.set_model_name("test_dmadapt")
    C.set_model_type(C.MODEL.LightweightOpenpose)
    C.set_model_inout(hin=64, win=64, hout=8, wout=8)
    C.set_batch_size(2)
    C.set_compute_dtype("float32")
    cfg = C.get_config(create_dirs=False)
    cfg.model.model_dir = str(tmp_path / "model")
    cfg.train.save_interval = 100
    cfg.log.log_interval = 1
    cfg.data.domainadapt_flag = True
    os.makedirs(cfg.model.model_dir, exist_ok=True)

    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        path = str(tmp_path / f"l_{i}.jpg")
        cv2.imwrite(path, img)
        kpts = np.full((1, 19, 2), MISSING, np.float32)
        valid = np.zeros((1, 19), bool)
        kpts[0, :4] = rng.uniform(10, 80, (4, 2))
        valid[0, :4] = True
        records.append(TrainRecord(path, kpts, valid))

    def unlabeled_batches():
        while True:
            yield rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)

    aug = BasicAugmentor(hin=64, win=64, flip_list=COCO_FLIP_LIST)
    model = LightWeightOpenPose(dtype=jnp.float32)
    trainer = Trainer(cfg, model, COCO_LIMBS)
    assert trainer.domainadapt
    pipe = TrainPipeline(records, aug, batch_size=2, out_hw=(8, 8),
                         max_people=2, n_workers=1)
    params, stats = trainer.train(
        pipe, n_step=2, unlabeled_pipeline=unlabeled_batches()
    )
    pipe.stop()
    assert params is not None
    # discriminator state made it into the checkpoint
    state_like = {
        "params": params, "batch_stats": stats,
        "opt_state": trainer.optimizer.init(params),
    }
    d_params, d_opt = trainer.init_dmadapt_state(params, stats)
    state_like["d_params"] = d_params
    state_like["d_opt_state"] = d_opt
    step, restored = trainer.ckpt.restore(state_like)
    assert step == 2 and "d_params" in restored
