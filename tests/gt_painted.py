"""Shared gt-painted evaluation harness (see ACCURACY.md).

Feeds ground-truth-painted target maps (data.targets.openpose_targets)
through the REAL eval path — Evaluator batching, 2x decode upsample,
on-device PAF decode, output converters, official scorer — so dataset
parsing / decode / scorer regressions surface without training a model.
Used by tests/test_accuracy_loop.py (COCO mAP) and
tests/test_accuracy_loop_mpii.py (MPII PCKh).
"""
import numpy as np

import jax
import jax.numpy as jnp

from hyperpose_tpu.data.targets import openpose_targets
from hyperpose_tpu.eval.evaluate import EVAL_UPSAMPLE, Evaluator


class GtPaintedEvaluator(Evaluator):
    """Evaluator whose 'model' is the target generator fed with gt
    keypoints, consumed batch-by-batch in record order. Applies the same
    2x decode-resolution upsample as the real eval path."""

    def set_batches(self, batches):
        self._batches = list(batches)
        self._cursor = 0

    def infer_batch(self, images_u8):
        conf, paf = self._batches[self._cursor]
        self._cursor += 1
        b, h, w, _ = conf.shape
        dec_hw = (h * EVAL_UPSAMPLE, w * EVAL_UPSAMPLE)
        conf = jax.image.resize(conf, (b, *dec_hw, conf.shape[-1]), "cubic")
        paf = jax.image.resize(paf, (b, *dec_hw, paf.shape[-1]), "cubic")
        return self._decode(conf, paf)


def paint_batches(records, kpts_of_record, n_pos, limbs, in_hw, feat_hw,
                  batch_size, max_people):
    """Build gt-painted (conf, paf) batches in record order.

    kpts_of_record(rec) -> list of (kpts [n_pos, 2], valid [n_pos])."""
    batches = []
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        kpts = np.full((batch_size, max_people, n_pos, 2), -1000.0,
                       np.float32)
        valid = np.zeros((batch_size, max_people, n_pos), bool)
        for j, rec in enumerate(chunk):
            for m, (k, v) in enumerate(kpts_of_record(rec)):
                kpts[j, m] = k
                valid[j, m] = v
        t = openpose_targets(
            jnp.asarray(kpts), jnp.asarray(valid), limbs, in_hw, feat_hw,
        )
        batches.append((
            jnp.asarray(t["conf_map"], jnp.float32),
            jnp.asarray(t["paf_map"], jnp.float32),
        ))
    return batches
