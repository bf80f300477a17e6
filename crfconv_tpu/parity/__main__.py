"""CLI for the S3DIS parity runbook: python -m crfconv_tpu.parity --root ..."""

import argparse
import logging


def main():
    ap = argparse.ArgumentParser(
        description="S3DIS Area-5 mIoU parity: crfconv_tpu vs the torch "
        "reference oracle (BASELINE.json ±0.3)"
    )
    ap.add_argument("--root", required=True, help="S3DIS dataset root "
                    "(raw/Stanford3dDataset_v1.2_Aligned_Version inside)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--num-votes", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="write the full JSON report")
    ap.add_argument(
        "--dry-run", action="store_true",
        help="synthesize a tiny raw corpus under --root and run the whole "
        "harness end-to-end (CI check; minutes, not hours)",
    )
    ap.add_argument(
        "--corpus", default=None, choices=[None, "rooms"],
        help="'rooms': at-scale structured synthetic corpus "
        "(parity/synthetic.py) instead of real S3DIS data",
    )
    ap.add_argument("--rooms-per-area", type=int, default=8)
    ap.add_argument("--pts-per-room", type=int, default=80_000)
    ap.add_argument(
        "--patience", type=int, default=None,
        help="early-stop patience (epochs without val-mIoU improvement)",
    )
    ap.add_argument(
        "--scale-kw", default=None,
        help="JSON dict of cfg overrides, e.g. "
        '\'{"sample_num": 4096, "batch_size": 4}\'',
    )
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import json

    from crfconv_tpu.parity import run_parity

    run_parity(
        args.root, epochs=args.epochs, num_votes=args.num_votes,
        seed=args.seed, dry_run=args.dry_run, out=args.out,
        corpus=args.corpus, rooms_per_area=args.rooms_per_area,
        pts_per_room=args.pts_per_room, patience=args.patience,
        scale_kw=json.loads(args.scale_kw) if args.scale_kw else None,
    )


if __name__ == "__main__":
    main()
