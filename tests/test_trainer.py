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
