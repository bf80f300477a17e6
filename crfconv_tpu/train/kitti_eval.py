"""SemanticKITTI streaming evaluation protocol.

The reference has no KITTI eval loop (its dataset is sample-only,
semantickitti_dataset.py:85-109); the official benchmark protocol is
per-sequence, per-scan: every point of every scan in a held-out
sequence is labeled, and IoU is reported per sequence and overall.
This module drives that protocol over ``SemanticKITTIDataset``:
sequences are walked in temporal order (``frames_of``), each FULL scan
(``get_frame``, no subsampling) goes through a caller-supplied
``predict_fn``, and confusion accumulates in one ``RunningScore`` per
sequence plus a global one.

Label space: mapped labels are 1..num_classes with 0 = unlabeled; the
accumulators work in network space (y-1, ignore_index=-1), matching the
trainer's ``label_offset=1`` convention for this dataset
(train/config.py SemanticKITTIConfig).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from crfconv_tpu.train.metrics import RunningScore


def streaming_eval(
    dataset,
    predict_fn: Callable[[dict], np.ndarray],
    max_frames_per_seq: Optional[int] = None,
) -> Dict:
    """Per-sequence streaming eval.

    predict_fn(frame_dict) -> int array [N] of network-space class ids
    (0..num_classes-1) for every point of the frame.  Returns
    {"per_sequence": {seq: scores}, "overall": scores} where scores is
    the RunningScore dict (OA / mean acc / mIoU / per-class IoU).
    """
    n_cls = dataset.num_classes
    overall = RunningScore(n_cls, ignore_index=-1)
    per_seq: Dict[str, Dict] = {}
    for seq in dataset.sequences:
        score = RunningScore(n_cls, ignore_index=-1)
        idxs = dataset.frames_of(seq)
        if max_frames_per_seq is not None:
            idxs = idxs[:max_frames_per_seq]
        for idx in idxs:
            frame = dataset.get_frame(idx)
            pred = np.asarray(predict_fn(frame)).reshape(-1)
            if pred.shape[0] != frame["pos"].shape[0]:
                raise ValueError(
                    f"predict_fn returned {pred.shape[0]} labels for a "
                    f"{frame['pos'].shape[0]}-point frame"
                )
            gt = frame["y"] - 1          # 0 (unlabeled) -> -1 = ignore
            score.update(gt, pred)
            overall.update(gt, pred)
        scores, cls_iou = score.get_scores()
        scores["per_class_IoU"] = cls_iou
        scores["num_frames"] = len(idxs)
        per_seq[seq] = scores
    scores, cls_iou = overall.get_scores()
    scores["per_class_IoU"] = cls_iou
    return {"per_sequence": per_seq, "overall": scores}
