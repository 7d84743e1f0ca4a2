"""End-to-end smoke: synthetic records -> pipeline -> sharded train step."""
import os

import numpy as np
import pytest

from hyperpose_tpu import config as C
from hyperpose_tpu.data.augment import MISSING, BasicAugmentor
from hyperpose_tpu.data.base import TrainRecord
from hyperpose_tpu.data.pipeline import TrainPipeline
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.utils.topology import COCO_LIMBS, COCO_FLIP_LIST


@pytest.fixture
def tiny_config(tmp_path):
    C.reset()
    C.set_model_name("test_tiny")
    C.set_model_type(C.MODEL.LightweightOpenpose)
    C.set_model_inout(hin=64, win=64, hout=8, wout=8)
    C.set_batch_size(4)
    C.set_compute_dtype("float32")
    cfg = C.get_config(create_dirs=False)
    cfg.model.model_dir = str(tmp_path / "model")
    cfg.train.save_interval = 2
    cfg.log.log_interval = 1
    os.makedirs(cfg.model.model_dir, exist_ok=True)
    return cfg


def synthetic_records(tmp_path, n=8):
    import cv2

    records = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
        path = str(tmp_path / f"img_{i}.jpg")
        cv2.imwrite(path, img)
        kpts = np.full((2, 19, 2), MISSING, np.float32)
        valid = np.zeros((2, 19), bool)
        kpts[0, :5] = rng.uniform(20, 100, (5, 2))
        valid[0, :5] = True
        records.append(TrainRecord(path, kpts, valid, mask_fn=None))
    return records


def test_pipeline_batches(tmp_path, tiny_config):
    records = synthetic_records(tmp_path)
    aug = BasicAugmentor(hin=64, win=64, flip_list=COCO_FLIP_LIST)
    pipe = TrainPipeline(
        records, aug, batch_size=4, out_hw=(8, 8), max_people=5,
        n_workers=2, loop=True,
    )
    it = iter(pipe)
    batch = next(it)
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["kpts"].shape == (4, 5, 19, 2)
    assert batch["valid"].shape == (4, 5, 19)
    assert batch["mask"].shape == (4, 8, 8, 1)
    pipe.stop()


def test_trainer_two_steps_and_resume(tmp_path, tiny_config):
    from hyperpose_tpu.train.trainer import Trainer

    records = synthetic_records(tmp_path)
    aug = BasicAugmentor(hin=64, win=64, flip_list=COCO_FLIP_LIST)
    model = LightWeightOpenPose()

    trainer = Trainer(tiny_config, model, COCO_LIMBS)
    pipe = TrainPipeline(
        records, aug, batch_size=4, out_hw=(8, 8), max_people=5,
        n_workers=2, loop=True,
    )
    params, stats = trainer.train(pipe, n_step=2)
    pipe.stop()
    assert os.path.exists(
        os.path.join(tiny_config.model.model_dir, "newest_model.npz")
    )
    # Resume: a fresh trainer should restore step 2 and continue.
    trainer2 = Trainer(tiny_config, model, COCO_LIMBS)
    pipe2 = TrainPipeline(
        records, aug, batch_size=4, out_hw=(8, 8), max_people=5,
        n_workers=2, loop=True,
    )
    trainer2.train(pipe2, n_step=3)
    pipe2.stop()
    assert trainer2.ckpt.latest_step() == 3


@pytest.mark.parametrize("model_type,hw,out_hw,n_parts", [
    ("PoseProposal", (96, 96), (3, 3), 18),
    ("Pifpaf", (64, 64), (8, 8), 17),
])
def test_trainer_other_families(tmp_path, model_type, hw, out_hw, n_parts):
    from hyperpose_tpu import config as C2
    from hyperpose_tpu import models as M2
    from hyperpose_tpu.train.trainer import Trainer

    C2.reset()
    C2.set_model_name(f"test_{model_type}")
    C2.set_model_type(C2.MODEL[model_type])
    C2.set_model_inout(hin=hw[0], win=hw[1], hout=out_hw[0], wout=out_hw[1])
    C2.set_batch_size(2)
    C2.set_compute_dtype("float32")
    cfg = C2.get_config(create_dirs=False)
    cfg.model.model_dir = str(tmp_path / "model")
    cfg.train.save_interval = 100
    cfg.log.log_interval = 1
    os.makedirs(cfg.model.model_dir, exist_ok=True)

    records = synthetic_records(tmp_path, n=4)
    # trim/grow keypoint rows to this family's part count
    for r in records:
        r.kpts = r.kpts[:, :n_parts]
        r.valid = r.valid[:, :n_parts]
    topo = M2.get_topology(cfg)
    from hyperpose_tpu.data.augment import BasicAugmentor
    aug = BasicAugmentor(hin=hw[0], win=hw[1], flip_list=topo.flip_list)
    model = M2.get_model(cfg)
    trainer = Trainer(cfg, model, topo.limbs)
    pipe = TrainPipeline(records, aug, batch_size=2, out_hw=out_hw,
                         max_people=3, n_parts=n_parts, n_workers=1)
    params, stats = trainer.train(pipe, n_step=2)
    pipe.stop()
    assert params is not None


def test_trainer_sync_avg_mode(tmp_path, tiny_config):
    """Sync_avg (KungFu SynchronousAveraging analog) trains on the virtual
    mesh."""
    from hyperpose_tpu import config as C3
    from hyperpose_tpu.train.trainer import Trainer

    tiny_config.train.sync_type = C3.SYNC.Sync_avg
    tiny_config.train.n_devices = 4
    records = synthetic_records(tmp_path)
    aug = BasicAugmentor(hin=64, win=64, flip_list=COCO_FLIP_LIST)
    model = LightWeightOpenPose()
    trainer = Trainer(tiny_config, model, COCO_LIMBS)
    pipe = TrainPipeline(records, aug, batch_size=4, out_hw=(8, 8),
                         max_people=5, n_workers=1)
    params, stats = trainer.train(pipe, n_step=2)
    pipe.stop()
    assert params is not None


def test_trainer_visualization(tmp_path, tiny_config):
    from hyperpose_tpu.train.trainer import Trainer
    from hyperpose_tpu.utils.topology import COCO_TOPOLOGY
    from hyperpose_tpu.utils.visualize import Visualizer

    tiny_config.train.vis_interval = 1
    records = synthetic_records(tmp_path)
    aug = BasicAugmentor(hin=64, win=64, flip_list=COCO_FLIP_LIST)
    model = LightWeightOpenPose()
    trainer = Trainer(tiny_config, model, COCO_LIMBS)
    vis = Visualizer(COCO_TOPOLOGY, save_dir=str(tmp_path / "vis"))
    pipe = TrainPipeline(records, aug, batch_size=4, out_hw=(8, 8),
                         max_people=5, n_workers=1)
    trainer.train(pipe, n_step=1, visualizer=vis)
    pipe.stop()
    import glob
    assert glob.glob(str(tmp_path / "vis" / "*maps.png"))


def test_trainer_grad_accum(tmp_path, tiny_config):
    """grad_accum_steps=2: params frozen during accumulation micro-steps,
    updated on every 2nd; effective batch doubles per optimizer update."""
    import jax

    from hyperpose_tpu.train.trainer import Trainer

    tiny_config.train.grad_accum_steps = 2
    tiny_config.train.save_interval = 100
    records = synthetic_records(tmp_path)
    aug = BasicAugmentor(hin=64, win=64, flip_list=COCO_FLIP_LIST)
    model = LightWeightOpenPose()

    trainer = Trainer(tiny_config, model, COCO_LIMBS)
    pipe = TrainPipeline(
        records, aug, batch_size=4, out_hw=(8, 8), max_people=5,
        n_workers=2, loop=True,
    )
    # init_state is deterministic (PRNGKey(0)), so it doubles as the
    # known starting point for both train() calls below (no ckpt saved).
    p0, _, _ = trainer.init_state()
    leaves0 = jax.tree.leaves(jax.device_get(p0))
    p1, _ = trainer.train(pipe, n_step=1)
    leaves1 = jax.tree.leaves(jax.device_get(p1))
    # after 1 micro-step the MultiSteps wrapper has not applied an update
    same = all(np.allclose(a, b) for a, b in zip(leaves0, leaves1))
    assert same, "params changed during accumulation micro-step"
    p2, _ = trainer.train(pipe, n_step=2)
    leaves2 = jax.tree.leaves(jax.device_get(p2))
    assert not all(
        np.allclose(a, b) for a, b in zip(leaves0, leaves2)
    ), "params did not update after a full accumulation cycle"
    pipe.stop()
