"""Shared gt-painted PoseProposal evaluation harness (see ACCURACY.md).

Feeds ground-truth-painted PPN grid targets (data.targets.ppn_targets)
back as perfect predictions through the REAL eval path — Evaluator
batching, restore_coor, the golden-tested on-device PPN decode, output
converters, official scorer — bounding what ANY trained PoseProposal can
score through the grid representation (the denominator for trained PPN
rows). Used by tests/test_accuracy_loop_ppn.py (CI twin) and
scripts/eval_ppn_ceiling.py (full scale, COCO + MPII protocols).
"""
import numpy as np

import jax.numpy as jnp

from hyperpose_tpu.data.targets import ppn_targets
from hyperpose_tpu.eval.evaluate import Evaluator
from hyperpose_tpu.models.pose_proposal import PoseProposal
from hyperpose_tpu.ops.ppn_decode import PpnDecoderConfig, ppn_decode_batch
from hyperpose_tpu.utils.human import SkeletonBatch
from hyperpose_tpu.utils.topology import instance_part_idx


def paint_ppn_decoded(kpts, valid, bbxs, cfg, topo):
    """gt keypoints (model layout, input-frame px) -> painted grid targets
    -> restore_coor -> on-device PPN decode -> SkeletonBatch."""
    m = cfg.model
    in_hw, out_hw = (m.hin, m.win), (m.hout, m.wout)
    inst = instance_part_idx(topo)
    t = ppn_targets(
        jnp.asarray(kpts), jnp.asarray(valid), jnp.asarray(bbxs),
        topo.limbs, in_hw, out_hw, nei=(m.hnei, m.wnei), instance_idx=inst,
    )
    model = PoseProposal(K=m.n_pos, L=len(topo.limbs), hnei=m.hnei,
                         wnei=m.wnei, hin=m.hin, win=m.win)
    rx, ry, rw, rh = model.restore_coor(
        t["x"], t["y"], t["w"], t["h"], out_hw[0], out_hw[1]
    )
    pred = {"c": t["c"], "i": t["c"], "x": rx, "y": ry, "w": rw, "h": rh,
            "e": t["e"]}
    out = ppn_decode_batch(
        pred, PpnDecoderConfig(instance_part=inst),
        hnei=m.hnei, wnei=m.wnei, in_hw=in_hw, topology=topo,
    )
    return SkeletonBatch(*(np.asarray(v) for v in (
        out.coords, out.part_scores, out.part_valid, out.scores, out.valid,
    )))


class GtPaintedPpnEvaluator(Evaluator):
    """Evaluator whose 'model' is the painted-target decode, consumed
    batch-by-batch in record order."""

    def set_batches(self, batches):
        self._batches = list(batches)
        self._cursor = 0

    def infer_batch(self, images_u8):
        out = self._batches[self._cursor]
        self._cursor += 1
        return out


def paint_ppn_batches(records, people_of_record, cfg, topo, batch_size,
                      max_people):
    """people_of_record(rec) -> list of (kpts [K,2] input-frame px,
    valid [K], bbox [4] xywh input-frame px)."""
    m = cfg.model
    k = m.n_pos
    batches = []
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        kpts = np.full((batch_size, max_people, k, 2), -1000.0, np.float32)
        valid = np.zeros((batch_size, max_people, k), bool)
        bbxs = np.zeros((batch_size, max_people, 4), np.float32)
        for j, rec in enumerate(chunk):
            for p, (kp, v, bb) in enumerate(people_of_record(rec)):
                kpts[j, p] = kp
                valid[j, p] = v
                bbxs[j, p] = bb
        batches.append(paint_ppn_decoded(kpts, valid, bbxs, cfg, topo))
    return batches
