"""Coverage for multiscale eval, lr schedules, multi-dataset, tracing."""
import numpy as np
import pytest

from hyperpose_tpu import Config


@pytest.fixture(autouse=True)
def reset_config():
    Config.reset()
    yield
    Config.reset()


def test_multiscale_eval_path(tmp_path):
    """Multiscale search runs all 4 scales and decodes
    (reference: openpose/eval.py:14-53)."""
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.eval.evaluate import Evaluator
    from hyperpose_tpu.models.openpose import LightWeightOpenPose
    from hyperpose_tpu.utils.topology import COCO_TOPOLOGY

    model = LightWeightOpenPose(dtype=jnp.float32)
    hw = (64, 64)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False
    )
    ev = Evaluator(
        model, variables, dataset=None, input_hw=hw,
        output_converter=lambda k: [], topology=COCO_TOPOLOGY,
        batch_size=2, multiscale=True,
    )
    batch = np.random.default_rng(0).integers(
        0, 255, (2, *hw, 3), dtype=np.uint8
    )
    sk = ev.infer_batch(batch)
    assert sk.coords.shape[0] == 2


def test_staged_lr_schedule():
    from hyperpose_tpu.train.trainer import staged_lr_schedule

    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    cfg = Config.get_config(create_dirs=False)
    cfg.train.lr_init = 1e-3
    cfg.train.lr_decay_every_step = 100
    cfg.train.lr_decay_factor = 0.5
    sched = staged_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(150)) == pytest.approx(5e-4)
    assert float(sched(250)) == pytest.approx(2.5e-4)
    # pifpaf-style boundary decay
    cfg.train.lr_decay_steps = (100, 200)
    cfg.train.lr_decay_factor = 0.1
    sched2 = staged_lr_schedule(cfg)
    assert float(sched2(50)) == pytest.approx(1e-3)
    assert float(sched2(150)) == pytest.approx(1e-4)
    assert float(sched2(250)) == pytest.approx(1e-5)


def test_multi_dataset_concatenation():
    from hyperpose_tpu.data.base import TrainRecord
    from hyperpose_tpu.data.multi import MultiPoseDataset, UserPoseDataset

    k = np.zeros((1, 19, 2), np.float32)
    v = np.ones((1, 19), bool)
    ds1 = UserPoseDataset([("a.jpg", k, v), ("b.jpg", k, v)])
    ds2 = UserPoseDataset([("c.jpg", k, v)])
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    cfg = Config.get_config(create_dirs=False)
    multi = MultiPoseDataset(cfg, [ds1, ds2], scale_rates=[1, 2])
    records = multi.get_train_records()
    assert len(records) == 2 + 2 * 1
    assert isinstance(records[0], TrainRecord)


def test_tracing_scopes():
    from hyperpose_tpu.utils import tracing

    tracing.reset()
    tracing.enable(True)
    with tracing.scope("unit/test"):
        pass
    with tracing.scope("unit/test"):
        pass
    rep = tracing.report()
    assert rep["unit/test"]["count"] == 2
    tracing.enable(False)


def test_examine_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.train.checkpoint import save_weights_npz
    from hyperpose_tpu.utils.examine import (
        compare_weights, exam_model_weights, exam_npz_dict_weights,
    )

    model = VggTiny()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    rows = exam_model_weights(variables, logger=lambda *_: None)
    assert len(rows) > 10
    path = str(tmp_path / "w.npz")
    save_weights_npz(variables, path)
    rows2 = exam_npz_dict_weights(path, logger=lambda *_: None)
    assert len(rows2) == len(rows)
    assert compare_weights(variables, path) == {}
