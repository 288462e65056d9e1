#!/usr/bin/env python
"""Multi-image SR inference over the case registry — MISR master.py equivalent.

Reference: multi-image-super-resolution/master.py. The reference restores a
pretrained TF checkpoint (RED_RAMS); its weight shards are not distributed
(.MISSING_LARGE_BLOBS), so this CLI either restores an orbax checkpoint
trained with our Trainer (--ckpt) or runs with fresh init (--allow_untrained)
to exercise the full path.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.config import RAMSConfig
from mri_super_resolution_tpu.data import load_cases
from mri_super_resolution_tpu.pipelines import misr
from mri_super_resolution_tpu.utils import restore_pytree, unwrap_trainer_params


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Superresolution of DWI/ADC maps with Multi-image SR"
    )
    # (no --out_folder: the reference MISR master.py:29-68 emits only
    # DICOMs, no experiment CSVs — a dead flag here implied otherwise)
    p.add_argument("--out_img_folder", default="output_images.mi/")
    p.add_argument("--exp_name", default="sr2")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint of RAMS params")
    p.add_argument("--allow_untrained", action="store_true")
    p.add_argument("--sample_size", type=int, default=25)
    p.add_argument("--limit_cases", type=int, default=None)
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--N", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = RAMSConfig(filters=args.filters, N=args.N)
    model = misr.build_rams(cfg)
    if args.ckpt is None and not args.allow_untrained:
        # the committed pretrained artifact (this framework's analog of the
        # reference's shipped RED_RAMS checkpoint, master.py:27) is the
        # default at the reference architecture; --allow_untrained opts out
        # so the fresh-init path stays reachable
        default_params = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "rams_dwi_params")
        if (args.filters, args.N) == (32, 12) and os.path.isdir(default_params):
            args.ckpt = default_params
            print(f"restoring committed pretrained params: {args.ckpt}")
    if args.ckpt:
        params = unwrap_trainer_params(restore_pytree(os.path.abspath(args.ckpt)))
    elif args.allow_untrained:
        dummy = jnp.zeros((1, 16, 16, cfg.channels), jnp.float32)
        params = model.init(jax.random.key(args.seed), dummy)
        print("WARNING: running with untrained weights (--allow_untrained)")
    else:
        p.error("provide --ckpt or pass --allow_untrained")

    cases = load_cases(limit=args.limit_cases)
    if not cases:
        p.error("no cases found")
    misr.run(
        cases, cfg, params, args.out_img_folder, args.exp_name,
        sample_size=args.sample_size, seed=args.seed,
    )
    print(f"wrote DICOMs under {args.out_img_folder}/{args.exp_name}")


if __name__ == "__main__":
    main()
