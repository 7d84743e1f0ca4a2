"""Evaluation / test pipelines: model -> COCO-format results -> metrics.

Mirrors the reference's evaluate/test flows (reference:
hyperpose/Model/openpose/eval.py:14-218 — infer_one_img, multiscale_search,
COCO-format result writing, official_eval/official_test) on top of the
batched fused engine instead of per-image TF sessions.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.base import BasePoseDataset, EvalRecord
from ..ops.paf_decode import PafDecoderConfig, paf_decode_batch
from ..utils.human import Human, SkeletonBatch
from ..utils.topology import Topology

logger = logging.getLogger("hyperpose_tpu.MODEL")

# Python-side eval decode thresholds (reference: openpose/processor.py:36-37:
# thresh_vec_cnt=6, thresh_human_score=0.3) at 2x-upsampled maps: the
# reference decodes its maps upsampled (INTER_CUBIC, processor.py:75-95 /
# paf.cpp:337-340 4x) because keypoints closer than one stride-8 cell merge
# under 3x3 peak NMS at feature resolution (eyes/ears of small figures).
# 2x recovers them at a quarter of 4x's decode area; smooth params are the
# reference's 4x values rescaled; upsample=2 keeps the length penalty at
# the reference's virtual-4x convention.
EVAL_UPSAMPLE = 2
EVAL_DECODER = PafDecoderConfig(
    crit1_thresh=6, min_human_score=0.3, upsample=4 // EVAL_UPSAMPLE,
    smooth_ksize=9, smooth_sigma=1.5, max_peaks=24,
)

MULTISCALE = (0.5, 1.0, 1.5, 2.0)  # reference: openpose/eval.py:16


def _pad_to(x: int, stride: int = 8) -> int:
    return int(np.ceil(x / stride) * stride)


class Evaluator:
    """Batched COCO evaluation for PAF-family models."""

    def __init__(
        self, model, variables, dataset: BasePoseDataset,
        input_hw: tuple[int, int], output_converter: Callable,
        topology: Topology, batch_size: int = 8,
        decoder: PafDecoderConfig = EVAL_DECODER, multiscale: bool = False,
        fused_decode: Callable | None = None,
    ):
        """fused_decode(variables, images_u8) -> DecodedSkeletons overrides
        the default PAF-family path (used for PoseProposal / PifPaf)."""
        self.model = model
        self.variables = variables
        self.dataset = dataset
        self.input_hw = input_hw
        self.output_converter = output_converter
        self.topology = topology
        self.batch_size = batch_size
        # EVAL_DECODER carries COCO part/limb counts; re-target them to the
        # active topology (MPII: 15 parts + Center, 14 limbs).
        import dataclasses

        if (decoder.n_parts != topology.n_parts
                or decoder.n_limbs != topology.n_limbs):
            decoder = dataclasses.replace(
                decoder, n_parts=topology.n_parts, n_limbs=topology.n_limbs,
            )
        self.decoder = decoder
        self.multiscale = multiscale
        self._fused_decode = fused_decode
        self._jitted = {}

    def _forward_maps(self, images: jax.Array, hw: tuple[int, int]):
        """Jitted forward for a given input resolution, returning
        (conf, paf) resized to the base feature grid."""
        key = hw
        if key not in self._jitted:
            model = self.model
            base_hw = (self.input_hw[0] // 8, self.input_hw[1] // 8)

            dec_hw = (base_hw[0] * EVAL_UPSAMPLE, base_hw[1] * EVAL_UPSAMPLE)

            @jax.jit
            def fwd(variables, x):
                out = model.apply(variables, x.astype(model.dtype) / 255.0,
                                  train=False)
                conf = out["conf_map"].astype(jnp.float32)
                paf = out["paf_map"].astype(jnp.float32)
                # decode-resolution upsample (reference: INTER_CUBIC map
                # upsampling, openpose/processor.py:75-95)
                b = conf.shape[0]
                if conf.shape[1:3] != dec_hw:
                    conf = jax.image.resize(
                        conf, (b, *dec_hw, conf.shape[-1]), "cubic"
                    )
                    paf = jax.image.resize(
                        paf, (b, *dec_hw, paf.shape[-1]), "cubic"
                    )
                return conf, paf

            self._jitted[key] = fwd
        return self._jitted[key](self.variables, images)

    def _decode(self, conf, paf) -> SkeletonBatch:
        out = paf_decode_batch(conf, paf, self.decoder, None, self.topology)
        return SkeletonBatch(*(np.asarray(t) for t in (
            out.coords, out.part_scores, out.part_valid, out.scores, out.valid
        )))

    def infer_batch(self, images_u8: np.ndarray) -> SkeletonBatch:
        """Single- or multi-scale inference on a uint8 [B, hin, win, 3] batch
        (reference: eval.py:14-53 multiscale_search averages restored maps)."""
        if self._fused_decode is not None:
            out = self._fused_decode(self.variables, jnp.asarray(images_u8))
            return SkeletonBatch(*(np.asarray(t) for t in (
                out.coords, out.part_scores, out.part_valid, out.scores,
                out.valid,
            )))
        if not self.multiscale:
            conf, paf = self._forward_maps(jnp.asarray(images_u8), self.input_hw)
        else:
            h, w = self.input_hw
            confs, pafs = [], []
            for s in MULTISCALE:
                sh, sw = _pad_to(int(h * s)), _pad_to(int(w * s))
                import cv2

                scaled = np.stack([
                    cv2.resize(img, (sw, sh)) for img in images_u8
                ])
                c, p = self._forward_maps(jnp.asarray(scaled), (sh, sw))
                confs.append(c)
                pafs.append(p)
            conf = jnp.mean(jnp.stack(confs), axis=0)
            paf = jnp.mean(jnp.stack(pafs), axis=0)
        return self._decode(conf, paf)

    def humans_to_coco_ann(
        self, humans: Sequence[Human], image_id: int, orig_hw: tuple[int, int]
    ) -> list[dict]:
        anns = []
        oh, ow = orig_hw
        for human in humans:
            kpts_xy = np.full((len(self.topology.parts), 2), -1000.0)
            for idx, part in human.parts.items():
                kpts_xy[idx] = (part.x * ow, part.y * oh)
            anns.append({
                "image_id": int(image_id),
                "category_id": 1,
                "keypoints": self.output_converter(kpts_xy),
                "score": float(human.score),
            })
        return anns

    def evaluate(
        self, records: Sequence[EvalRecord] | None = None,
        limit: int | None = None, eval_dir: str = "./eval_dir",
    ) -> dict[str, float]:
        import cv2

        records = list(records if records is not None
                       else self.dataset.get_eval_records())
        if limit:
            records = records[:limit]
        h, w = self.input_hw
        results: list[dict] = []
        for i in range(0, len(records), self.batch_size):
            chunk = records[i:i + self.batch_size]
            batch = np.zeros((self.batch_size, h, w, 3), np.uint8)
            sizes = []
            for j, rec in enumerate(chunk):
                img = cv2.imread(rec.image_path)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                sizes.append(img.shape[:2])
                batch[j] = cv2.resize(img, (w, h))
            sk = self.infer_batch(batch)
            for j, rec in enumerate(chunk):
                results.extend(self.humans_to_coco_ann(
                    sk.to_humans(j), rec.image_id, sizes[j]
                ))
            if (i // self.batch_size) % 20 == 0:
                logger.info("eval %d/%d images", i + len(chunk), len(records))
        os.makedirs(eval_dir, exist_ok=True)
        return self.dataset.official_eval(results, eval_dir)

    def test(self, records=None, limit=None, test_dir: str = "./test_dir"):
        """official_test: write server-upload json without local metrics
        (reference: eval.py:151-218, mscoco_dataset/dataset.py:188-195)."""
        import cv2

        records = list(records if records is not None
                       else self.dataset.get_test_records())
        if limit:
            records = records[:limit]
        h, w = self.input_hw
        results = []
        for i in range(0, len(records), self.batch_size):
            chunk = records[i:i + self.batch_size]
            batch = np.zeros((self.batch_size, h, w, 3), np.uint8)
            sizes = []
            for j, rec in enumerate(chunk):
                img = cv2.cvtColor(cv2.imread(rec.image_path), cv2.COLOR_BGR2RGB)
                sizes.append(img.shape[:2])
                batch[j] = cv2.resize(img, (w, h))
            sk = self.infer_batch(batch)
            for j, rec in enumerate(chunk):
                results.extend(self.humans_to_coco_ann(
                    sk.to_humans(j), rec.image_id, sizes[j]
                ))
        os.makedirs(test_dir, exist_ok=True)
        out_path = os.path.join(test_dir, "pd_ann.json")
        with open(out_path, "w") as f:
            json.dump(results, f)
        logger.info("wrote %d detections to %s", len(results), out_path)
        return out_path
