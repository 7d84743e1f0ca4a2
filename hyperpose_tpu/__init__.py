"""hyperpose-tpu: TPU-native real-time multi-person pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference HyperPose (TensorRT/C++ + TF2/TensorLayer) system: model zoo
(OpenPose family, PoseProposal, PifPaf over 10 backbones), on-device
fixed-shape decoders, sharded training, COCO/MPII datasets and evaluation,
and a streaming inference runtime.

    from hyperpose_tpu import Config, Model, Dataset
"""
from . import config as Config  # noqa: N812
from . import models as Model  # noqa: N812
from .data import base as Dataset  # noqa: N812

__version__ = "0.1.0"
