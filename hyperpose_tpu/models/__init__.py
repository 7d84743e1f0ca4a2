"""Model facade: enum-driven construction of models, pipelines and
processors (reference: hyperpose/Model/__init__.py:24-393).

    from hyperpose_tpu import config as Config
    from hyperpose_tpu import models as Model

    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    cfg = Config.get_config()
    model = Model.get_model(cfg)
    train = Model.get_train(cfg)
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

from ..config import BACKBONE, DATA, MODEL, TRAIN, Config
from ..utils.topology import (
    COCO_TOPOLOGY, MPII_TOPOLOGY, PIFPAF_TOPOLOGY, PPN_TOPOLOGY, Topology,
)
from . import backbones as _backbones
from .backbones import BACKBONES
from .openpose import (
    LightWeightOpenPose, MobilenetSmallOpenpose, MobilenetThinOpenpose,
    OpenPose, openpose_loss,
)
from .pifpaf import Pifpaf, pifpaf_loss
from .pose_proposal import PoseProposal, pose_proposal_loss

# Default backbone per model family (reference: Model/__init__.py:24-142).
_DEFAULT_BACKBONES = {
    MODEL.Openpose: "Vgg19",
    MODEL.LightweightOpenpose: "MobilenetDilated",
    MODEL.MobilenetThinOpenpose: "MobilenetThin",
    MODEL.PoseProposal: "Resnet18",
    MODEL.Pifpaf: "Resnet50",
}


def get_topology(config: Config) -> Topology:
    mt = config.model.model_type
    if config.model.custom_parts is not None:
        topo = config.model.custom_parts
        if config.model.custom_limbs is not None:
            import dataclasses

            topo = dataclasses.replace(
                topo, limbs=np.asarray(config.model.custom_limbs, np.int32)
            )
        return topo
    if mt == MODEL.PoseProposal:
        if config.data.dataset_type == DATA.MPII:
            from ..utils.topology import PPN_MPII_TOPOLOGY

            return PPN_MPII_TOPOLOGY
        return PPN_TOPOLOGY
    if mt == MODEL.Pifpaf:
        return PIFPAF_TOPOLOGY
    if config.data.dataset_type == DATA.MPII:
        return MPII_TOPOLOGY
    return COCO_TOPOLOGY


def _dtype_of(config: Config):
    return jnp.bfloat16 if config.model.compute_dtype == "bfloat16" else jnp.float32


def get_backbone(config: Config):
    name = config.model.model_backbone
    if name == BACKBONE.Default:
        return BACKBONES[_DEFAULT_BACKBONES[config.model.model_type]]
    return BACKBONES[name.name]


def get_model(config: Config):
    """Construct the flax model for the configured type/backbone
    (reference: Model/__init__.py:24-142)."""
    if config.model.model_arch is not None:
        arch = config.model.model_arch
        return arch(config) if callable(arch) and not hasattr(
            arch, "apply") else arch
    mt = config.model.model_type
    dtype = _dtype_of(config)
    topo = get_topology(config)
    backbone = get_backbone(config)
    n_pos = config.model.n_pos
    n_limbs = topo.n_limbs

    if mt == MODEL.Openpose:
        return OpenPose(n_confmaps=n_pos, n_pafmaps=2 * n_limbs,
                        backbone=backbone, dtype=dtype)
    if mt == MODEL.LightweightOpenpose:
        return LightWeightOpenPose(
            n_confmaps=n_pos, n_pafmaps=2 * n_limbs,
            num_channels=config.model.num_channels,
            backbone=backbone, dtype=dtype,
        )
    if mt == MODEL.MobilenetThinOpenpose:
        return MobilenetThinOpenpose(
            n_confmaps=n_pos, n_pafmaps=2 * n_limbs,
            backbone=backbone, dtype=dtype,
        )
    if mt == MODEL.PoseProposal:
        m = config.model
        return PoseProposal(
            K=m.K_size, L=m.L_size, hnei=m.hnei, wnei=m.wnei,
            hin=m.hin, win=m.win,
            backbone=backbone, dtype=dtype,
            lmd_rsp=m.lmd_rsp, lmd_iou=m.lmd_iou, lmd_coor=m.lmd_coor,
            lmd_size=m.lmd_size, lmd_limb=m.lmd_limb,
        )
    if mt == MODEL.Pifpaf:
        return Pifpaf(
            n_pos=n_pos, n_limbs=n_limbs,
            hin=config.model.hin, win=config.model.win, dtype=dtype,
        )
    raise ValueError(f"unknown model type {mt}")


def get_loss_fn(config: Config):
    mt = config.model.model_type
    if mt == MODEL.PoseProposal:
        return pose_proposal_loss
    if mt == MODEL.Pifpaf:
        return pifpaf_loss
    return openpose_loss


def get_augmentor(config: Config):
    """(reference: Model/__init__.py:292-310 get_augmentor)."""
    from ..data.augment import BasicAugmentor

    if config.model.custom_augmentor is not None:
        return config.model.custom_augmentor
    topo = get_topology(config)
    return BasicAugmentor(
        hin=config.model.hin, win=config.model.win,
        flip_list=topo.flip_list,
    )


def get_preprocessor(config: Config):
    """Returns the device-side target generator for the model family
    (reference: Model/__init__.py:312-333 get_preprocessor)."""
    from ..data import targets as T

    if config.model.custom_preprocessor is not None:
        return config.model.custom_preprocessor
    topo = get_topology(config)
    m = config.model
    mt = m.model_type
    if mt == MODEL.PoseProposal:
        return partial(
            T.ppn_targets, limbs=topo.limbs, in_hw=(m.hin, m.win),
            out_hw=(m.hout, m.wout), nei=(m.hnei, m.wnei),
        )
    if mt == MODEL.Pifpaf:
        return partial(
            T.pifpaf_targets, limbs=topo.limbs, in_hw=(m.hin, m.win),
            out_hw=(m.hout, m.wout),
        )
    return partial(
        T.openpose_targets, limbs=topo.limbs, in_hw=(m.hin, m.win),
        out_hw=(m.hout, m.wout),
    )


def get_postprocessor(config: Config):
    """Returns the batched on-device decoder callable
    (reference: Model/__init__.py:335-356 get_postprocessor)."""
    from ..ops.paf_decode import PafDecoderConfig, paf_decode_batch
    from ..ops.pifpaf_decode import PifPafDecoderConfig, pifpaf_decode_batch
    from ..ops.ppn_decode import PpnDecoderConfig, ppn_decode_batch

    if config.model.custom_postprocessor is not None:
        return config.model.custom_postprocessor
    topo = get_topology(config)
    m = config.model
    mt = m.model_type
    if mt == MODEL.PoseProposal:
        from ..utils.topology import instance_part_idx

        cfg = PpnDecoderConfig(instance_part=instance_part_idx(topo))
        if m.ppn_decoder:
            import dataclasses

            cfg = dataclasses.replace(cfg, **dict(m.ppn_decoder))
        return partial(
            ppn_decode_batch,
            cfg=cfg,
            hnei=m.hnei, wnei=m.wnei, in_hw=(m.hin, m.win), topology=topo,
        )
    if mt == MODEL.Pifpaf:
        stride = m.hin // m.hout
        return partial(
            pifpaf_decode_batch, cfg=PifPafDecoderConfig(), stride=stride,
            in_hw=(m.hin, m.win), topology=topo,
        )
    cfg = PafDecoderConfig(
        n_parts=topo.n_parts, n_limbs=topo.n_limbs,
    )
    return partial(paf_decode_batch, cfg=cfg, topology=topo)


def get_visualizer(config: Config):
    from ..utils.visualize import Visualizer

    if config.model.custom_visualizer is not None:
        return config.model.custom_visualizer
    return Visualizer(
        topology=get_topology(config), save_dir=config.train.vis_dir
    )


def get_train(config: Config):
    """Assemble the training entry (reference: Model/__init__.py:147-211).

    Both Single_train and Parallel_train map to the same sharded Trainer;
    Parallel_train simply spans every available device.
    """
    from ..data.pipeline import TrainPipeline
    from ..train.trainer import Trainer

    topo = get_topology(config)

    def train(model, dataset):
        records = dataset.get_train_records()
        augmentor = get_augmentor(config)
        pipeline = TrainPipeline(
            records, augmentor, batch_size=config.train.batch_size,
            out_hw=(config.model.hout, config.model.wout),
            n_parts=config.model.n_pos,
        )
        trainer = Trainer(config, model, topo.limbs)
        unlabeled = None
        if config.data.domainadapt_flag:
            from ..train.domainadapt import UnlabeledPipeline

            unlabeled = UnlabeledPipeline(
                config.data.domainadapt_train_img_paths, augmentor,
                batch_size=config.train.batch_size,
            )
        return trainer.train(pipeline, unlabeled_pipeline=unlabeled)

    return train


def _fused_decode_for(config: Config, model):
    """variables, images_u8 -> DecodedSkeletons for non-PAF families."""
    import jax

    import jax.numpy as jnp

    mt = config.model.model_type
    post = get_postprocessor(config)
    if mt == MODEL.PoseProposal:
        @jax.jit
        def fused(variables, images_u8):
            x = images_u8.astype(model.dtype) / 255.0
            out = model.apply(variables, x, train=False)
            hout, wout = out["c"].shape[1], out["c"].shape[2]
            rx, ry, rw, rh = model.restore_coor(
                out["x"], out["y"], out["w"], out["h"], hout, wout
            )
            pred = {"c": out["c"], "i": out["i"], "x": rx, "y": ry,
                    "w": rw, "h": rh, "e": out["e"]}
            return post(pred)

        return fused
    if mt == MODEL.Pifpaf:
        @jax.jit
        def fused(variables, images_u8):
            x = images_u8.astype(model.dtype) / 255.0
            out = model.apply(variables, x, train=False)
            return post(out)

        return fused
    return None


def get_evaluate(config: Config):
    """(reference: Model/__init__.py:213-250)."""
    from ..eval.evaluate import Evaluator

    topo = get_topology(config)

    def evaluate(model, variables, dataset, limit=None):
        ev = Evaluator(
            model, variables, dataset,
            input_hw=(config.model.hin, config.model.win),
            output_converter=dataset.output_converter,
            topology=topo, batch_size=config.eval.batch_size,
            multiscale=config.eval.multiscale,
            fused_decode=_fused_decode_for(config, model),
        )
        return ev.evaluate(limit=limit, eval_dir=config.eval.vis_dir)

    return evaluate


def get_test(config: Config):
    """(reference: Model/__init__.py:252-290)."""
    from ..eval.evaluate import Evaluator

    topo = get_topology(config)

    def test(model, variables, dataset, limit=None):
        ev = Evaluator(
            model, variables, dataset,
            input_hw=(config.model.hin, config.model.win),
            output_converter=dataset.output_converter,
            topology=topo, batch_size=config.eval.batch_size,
            fused_decode=_fused_decode_for(config, model),
        )
        return ev.test(limit=limit, test_dir=config.test.vis_dir)

    return test


def get_pretrain(config: Config):
    """(reference: Model/__init__.py:144, Model/pretrain.py:39)."""
    from ..train.pretrain import single_pretrain

    return partial(single_pretrain, config=config)
