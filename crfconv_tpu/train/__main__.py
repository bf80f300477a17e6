"""Command-line experiment driver.

The reference is launched by editing trainval.py:347 and running it;
here the equivalent is a real CLI:

    python -m crfconv_tpu.train --dataset S3DIS --root /data/S3DIS \
        --mode train --model PointConvBig --use-crf --steps 1

Every config field can be overridden with --set key=value.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

from crfconv_tpu.train.config import CONFIGS
from crfconv_tpu.train.trainer import Trainer
from crfconv_tpu.utils.logging import init_logger


def _coerce(value: str, ref):
    if isinstance(ref, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(ref, int):
        return int(value)
    if isinstance(ref, float):
        return float(value)
    if isinstance(ref, tuple):
        return tuple(type(ref[0])(v) for v in value.split(","))
    return value


def main(argv=None):
    p = argparse.ArgumentParser(prog="crfconv_tpu.train")
    p.add_argument("--dataset", required=True, choices=sorted(CONFIGS))
    p.add_argument("--root", required=True, help="dataset root directory")
    p.add_argument("--mode", default=None, choices=["train", "test"])
    p.add_argument("--model", default=None, help="model registry name")
    p.add_argument("--use-crf", action="store_true", default=None)
    p.add_argument("--no-crf", dest="use_crf", action="store_false")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--n-devices", type=int, default=None,
                   help="data-parallel device count (default: single)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-file", default=None)
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override any config field",
    )
    args = p.parse_args(argv)

    cfg = CONFIGS[args.dataset](root=args.root)
    for name, val in (
        ("mode", args.mode), ("model_name", args.model),
        ("use_crf", args.use_crf), ("steps", args.steps),
        ("epochs", args.epochs), ("batch_size", args.batch_size),
    ):
        if val is not None:
            setattr(cfg, name, val)
    for kv in args.set:
        key, _, value = kv.partition("=")
        if not hasattr(cfg, key):
            raise SystemExit(f"unknown config field {key!r}")
        setattr(cfg, key, _coerce(value, getattr(cfg, key)))

    init_logger(args.log_file, level=logging.INFO)
    trainer = Trainer(cfg, n_devices=args.n_devices, seed=args.seed)
    result = trainer()
    logging.getLogger("crfconv_tpu").info("done: %s", result)
    return result


if __name__ == "__main__":
    main()
