#!/usr/bin/env python
"""Cohort-parallel INR fitting across the device mesh (BASELINE config 5).

Fits every patient's cancer-slice mean simultaneously: case axis sharded over
chips, all fits inside one jitted scan. Reports cohort voxels/sec.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mri_super_resolution_tpu.data import load_cases
from mri_super_resolution_tpu.pipelines import cohort


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--hidden_features", type=int, default=64)
    p.add_argument("--hidden_layers", type=int, default=6)
    p.add_argument("--limit_cases", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--inr_restart_every", type=int, default=0,
                   help=">0: periodic Adam-moment restarts on the per-case "
                        "fits (fit/optim.restart_adam)")
    p.add_argument("--tensorboard_dir", default=None,
                   help="write per-case loss curves as tfevents under this dir")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed (multi-host): coordinator/"
                        "rank from MRI_SR_COORDINATOR / MRI_SR_NUM_PROCESSES /"
                        " MRI_SR_PROCESS_ID or auto-detection; see "
                        "docs/MULTIHOST.md")
    from mri_super_resolution_tpu.config import add_preset_arg

    add_preset_arg(p, argv)
    args = p.parse_args(argv)

    if args.distributed:
        from mri_super_resolution_tpu.parallel import init_distributed

        multi = init_distributed(auto=True)
        import jax

        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices"
              f" ({'multi' if multi else 'single'}-process)")

    cases = load_cases(limit=args.limit_cases)
    if not cases:
        p.error("no cases found")
    res = cohort.run_cohort(
        cases,
        num_steps=args.steps,
        hidden_features=args.hidden_features,
        hidden_layers=args.hidden_layers,
        seed=args.seed,
        inr_restart_every=args.inr_restart_every,
    )
    if args.tensorboard_dir:
        from mri_super_resolution_tpu.utils.tbevents import EventWriter

        for case, losses in zip(cases, res.losses):
            with EventWriter(os.path.join(args.tensorboard_dir, str(case.pt_id))) as w:
                for step, loss in enumerate(losses):
                    w.add_scalar("Loss", float(loss), step + 1)
        print(f"tfevents written to {args.tensorboard_dir}")
    print(
        f"cohort of {len(cases)} cases on mesh {res.mesh_shape}: "
        f"{res.voxels_per_sec:,.0f} voxels/sec, "
        f"final losses {[round(float(l), 5) for l in res.losses[:, -1]]}"
    )


if __name__ == "__main__":
    main()
