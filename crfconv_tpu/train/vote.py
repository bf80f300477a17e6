"""Labeled vote-based evaluation, shared by the Trainer and the parity
harness (reference trainval.py:218-327, ``test_s3dis``).

The caller supplies ``vote_epoch_fn`` — one pass over the validation
loader that updates ``test_probs`` (running-mean per-point class
probabilities) in place — so the same convergence/projection/rescaling
logic drives both the JAX model and the torch oracle.
"""

from __future__ import annotations

import logging
from typing import Callable, List

import numpy as np

log = logging.getLogger("crfconv_tpu")


def labeled_vote_eval(
    ds,
    vote_epoch_fn: Callable[[], None],
    test_probs: List[np.ndarray],
    num_votes: int = 100,
    vote_delta: float = 1.0,
) -> dict:
    """Vote until coverage, then report sub-cloud IoU (with class-
    proportion rescaling, trainval.py:281-283) and re-projected
    full-cloud IoU.  Returns {} if coverage is not reached within the
    vote cap (matches the reference's early-return quirk,
    trainval.py:324)."""
    from sklearn.metrics import confusion_matrix

    from crfconv_tpu.train.metrics import (
        iou_from_confusions,
        scores_from_confusion,
    )

    label_values = ds.label_values
    class_proportions = np.array(
        [
            np.sum([np.sum(l == lv) for l in ds.val_labels])
            for lv in label_values
        ],
        np.float32,
    )
    results = {}
    last_min, epoch = -0.5, 0
    while last_min < num_votes:
        vote_epoch_fn()
        new_min = float(np.min(ds.min_possibility))
        log.info("vote epoch %d, min possibility %.2f", epoch, new_min)
        if last_min + vote_delta < new_min:
            last_min += vote_delta
            # sub-cloud confusion with class-proportion rescaling
            confs = []
            for i in range(len(ds.input_labels)):
                preds = label_values[
                    np.argmax(test_probs[i], axis=1)
                ].astype(np.int32)
                confs.append(
                    confusion_matrix(
                        ds.input_labels[i], preds, labels=label_values
                    )
                )
            C = np.sum(np.stack(confs), axis=0).astype(np.float32)
            C *= np.expand_dims(
                class_proportions / (np.sum(C, axis=1) + 1e-6), 1
            )
            sub_iou = iou_from_confusions(C)
            results["sub_mIoU"] = float(np.mean(sub_iou))

            # full-cloud confusion via re-projection
            confs = []
            for i in range(len(ds.input_labels)):
                proj_probs = test_probs[i][ds.val_proj[i]]
                preds = label_values[
                    np.argmax(proj_probs, axis=1)
                ].astype(np.int32)
                confs.append(
                    confusion_matrix(
                        ds.val_labels[i], preds, labels=label_values
                    )
                )
            C = np.sum(np.stack(confs), axis=0)
            full_iou = iou_from_confusions(C)
            results["full_mIoU"] = float(np.mean(full_iou))
            results["full_IoUs"] = full_iou.tolist()
            scores, _ = scores_from_confusion(C)
            results.update(scores)
            log.info(
                "vote result: sub mIoU %.2f%%, full mIoU %.2f%%",
                results["sub_mIoU"] * 100, results["full_mIoU"] * 100,
            )
            return results
        epoch += 1
    return results
