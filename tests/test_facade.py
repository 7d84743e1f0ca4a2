"""Facade coverage: every model type constructs through get_model and the
component getters return callables."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu import Config, Model


@pytest.fixture(autouse=True)
def reset_config():
    Config.reset()
    yield
    Config.reset()


@pytest.mark.parametrize("model_type", list(Config.MODEL))
def test_get_model_constructs(model_type):
    Config.set_model_type(model_type)
    Config.set_compute_dtype("float32")
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    assert model is not None
    # tiny forward
    hw = (64, 64)
    x = jnp.zeros((1, *hw, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert isinstance(out, dict)


def test_component_getters():
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    cfg = Config.get_config(create_dirs=False)
    assert Model.get_augmentor(cfg) is not None
    assert callable(Model.get_preprocessor(cfg))
    assert callable(Model.get_postprocessor(cfg))
    assert callable(Model.get_train(cfg))
    assert callable(Model.get_evaluate(cfg))
    assert callable(Model.get_test(cfg))
    topo = Model.get_topology(cfg)
    assert topo.n_limbs == 19


def test_backbone_override():
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    Config.set_compute_dtype("float32")
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "backbone" in variables["params"]


def test_mpii_eval_metric():
    from hyperpose_tpu.eval.mpii_eval import pckh_eval

    rng = np.random.default_rng(0)
    gt_kpts = np.zeros((2, 16, 3), np.float32)
    gt_kpts[:, :, :2] = rng.uniform(50, 200, (2, 16, 2))
    gt_kpts[:, :, 2] = 1
    heads = np.array([[10, 10, 60, 60], [100, 100, 150, 150]], np.float32)
    gt = {0: (gt_kpts, heads)}
    # perfect predictions
    preds = [
        {"image_id": 0, "keypoints": np.concatenate(
            [gt_kpts[m, :, :2], np.ones((16, 1))], -1).reshape(-1).tolist(),
         "score": 1.0}
        for m in range(2)
    ]
    res = pckh_eval(preds, gt)
    assert res["PCKh"] == pytest.approx(1.0)
    # garbage predictions
    bad = [
        {"image_id": 0,
         "keypoints": (rng.uniform(300, 400, 48)).tolist(), "score": 1.0}
    ]
    res_bad = pckh_eval(bad, gt)
    assert res_bad["PCKh"] < 0.2


def test_export_roundtrip(tmp_path):
    from hyperpose_tpu.utils.export import (
        export_serialized, load_serialized, measure_flops,
    )

    def fn(x):
        return x * 2.0 + 1.0

    x = jnp.arange(8, dtype=jnp.float32)
    path = str(tmp_path / "fn.jaxexport")
    export_serialized(fn, (x,), path)
    loaded = load_serialized(path)
    np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(fn(x)))
    stats = measure_flops(fn, x)
    assert "flops" in stats


def test_engine_with_pifpaf_family():
    """PoseEngine dispatches through the per-family fused decoder."""
    import numpy as np

    from hyperpose_tpu.models import _fused_decode_for
    from hyperpose_tpu.runtime.engine import PoseEngine

    Config.set_model_type(Config.MODEL.Pifpaf)
    Config.set_model_inout(hin=64, win=64, hout=8, wout=8)
    Config.set_compute_dtype("float32")
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    fused = _fused_decode_for(cfg, model)
    engine = PoseEngine(
        model, variables, input_hw=(64, 64), max_batch_size=2,
        topology=Model.get_topology(cfg), fused_decode=fused,
    )
    engine.warmup()
    imgs = [np.zeros((96, 128, 3), np.uint8)] * 2
    results = engine.inference(imgs)
    assert len(results) == 2  # random weights: likely no humans, but flows
    # packed path agrees with direct path
    x = np.zeros((2, 64, 64, 3), np.uint8)
    packed = np.asarray(engine._step_packed(engine.variables, jnp.asarray(x)))
    sk = engine.unpack_skeletons(packed)
    direct = engine.infer_batch_device(jnp.asarray(x))
    np.testing.assert_allclose(
        sk.coords, np.asarray(direct.coords), atol=1e-6
    )


def test_custom_component_hooks():
    """set_custom_* overrides flow through the facade getters
    (reference: Config/__init__.py:512-535, Model/__init__.py:107-114)."""
    import dataclasses

    from hyperpose_tpu.models import (
        get_augmentor, get_postprocessor, get_preprocessor, get_topology,
        get_visualizer,
    )
    from hyperpose_tpu.utils.topology import COCO_TOPOLOGY

    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    custom_topo = dataclasses.replace(COCO_TOPOLOGY, name="custom")
    custom_limbs = np.array([[0, 1], [1, 2]], np.int32)
    sentinel_aug = object()
    sentinel_pre = object()
    sentinel_post = object()
    sentinel_vis = object()
    Config.set_custom_parts(custom_topo)
    Config.set_custom_limbs(custom_limbs)
    Config.set_custom_augmentor(sentinel_aug)
    Config.set_custom_preprocessor(sentinel_pre)
    Config.set_custom_postprocessor(sentinel_post)
    Config.set_custom_visualizer(sentinel_vis)
    cfg = Config.get_config(create_dirs=False)

    topo = get_topology(cfg)
    assert topo.name == "custom"
    assert topo.n_limbs == 2
    assert get_augmentor(cfg) is sentinel_aug
    assert get_preprocessor(cfg) is sentinel_pre
    assert get_postprocessor(cfg) is sentinel_post
    assert get_visualizer(cfg) is sentinel_vis
    Config.reset()


def test_set_model_arch_override():
    """set_model_arch replaces the built-in architecture
    (reference: Config/__init__.py:176-203, Model/__init__.py:44-46)."""
    from hyperpose_tpu.models import get_model
    from hyperpose_tpu.models.openpose import LightWeightOpenPose

    Config.reset()
    Config.set_model_type(Config.MODEL.Openpose)
    seen = {}

    def builder(cfg):
        seen["n_pos"] = cfg.model.n_pos
        return LightWeightOpenPose(n_confmaps=cfg.model.n_pos)

    Config.set_model_arch(builder)
    model = get_model(Config.get_config(create_dirs=False))
    assert isinstance(model, LightWeightOpenPose)
    assert seen["n_pos"] == 19
    # passing a module instance directly also works
    Config.reset()
    inst = LightWeightOpenPose()
    Config.set_model_arch(inst)
    assert get_model(Config.get_config(create_dirs=False)) is inst
    Config.reset()


def test_set_multiple_dataset_and_vis_interval():
    """(reference: Config/__init__.py:425-427,508-511)."""
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_multiple_dataset([])
    Config.set_vis_interval(123)
    cfg = Config.get_config(create_dirs=False)
    assert cfg.data.dataset_type == Config.DATA.MULTIPLE
    assert cfg.train.vis_interval == 123
    Config.reset()


def test_ppn_decoder_config_override():
    """set_ppn_decoder overrides flow into the PPN postprocessor's
    PpnDecoderConfig (tuned operating points, scripts/tune_ppn_decode.py);
    defaults stay at the reference parser constants."""
    Config.set_model_type(Config.MODEL.PoseProposal)
    try:
        cfg = Config.get_config(create_dirs=False)
        post = Model.get_postprocessor(cfg)
        assert post.keywords["cfg"].thresh_part_score == 0.2

        Config.set_ppn_decoder(thresh_part_score=0.1, min_parts=3)
        cfg = Config.get_config(create_dirs=False)
        post = Model.get_postprocessor(cfg)
        dec = post.keywords["cfg"]
        assert dec.thresh_part_score == 0.1
        assert dec.min_parts == 3
        assert dec.thresh_edge_score == 0.2  # untouched fields keep defaults
    finally:
        Config.set_ppn_decoder()
        Config.set_model_type(Config.MODEL.LightweightOpenpose)
