"""Datasets, augmentation, input pipeline, and on-device target generation.

Replaces the reference's hyperpose/Dataset package plus the target-map halves
of the per-algorithm PreProcessors (reference: Dataset/__init__.py:11-91,
Model/*/utils.py target generators).
"""
from .augment import MISSING, AugmentResult, BasicAugmentor
from .base import BasePoseDataset, EvalRecord, TrainRecord, get_dataset
from .pipeline import TrainPipeline

__all__ = [
    "MISSING", "AugmentResult", "BasicAugmentor", "BasePoseDataset",
    "EvalRecord", "TrainRecord", "get_dataset", "TrainPipeline",
]
