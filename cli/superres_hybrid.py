#!/usr/bin/env python
"""Hybrid multi-TE SR + 3-compartment tissue decomposition — superresHybrid.py
equivalent.

Reference: implicit-neural-representations/superresHybrid.py:25-188. Per
patient: average acquisitions per (b, TE); fit one FF-SIREN per TE on the 4-b
mean ROI volume (the four fits vmapped into one program); assemble the
(2sx, 2sy, S, 4b, 4TE) super-resolved hybrid; per-voxel 3-compartment NLLS ->
D / T2 / v maps; polyfit ADC; cancer map (v_ep > 0.4) & (v_lu <= 0.2) with
small-object cleanup. Saves per-slice PNG map panels + an npz of the maps.

Loads hybrid master.mat volumes if given, otherwise synthesizes hybrid
acquisitions from the distributed mean-b0 volumes (data/synthetic.py).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.data import load_mat, available_patients
from mri_super_resolution_tpu.data import synthetic
from mri_super_resolution_tpu.pipelines import superres3d
from mri_super_resolution_tpu.pipelines.hybrid import (
    HybridConfig,
    fit_all_te,
    make_pia_fitter,
    mean_over_acquisitions,
    tissue_maps,
)


def _save_maps_png(maps, out_dir: str, _slice: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = ["D_ep", "D_st", "D_lu", "v_ep", "v_st", "v_lu", "ADC", "cancer"]
    imgs = [maps.D[:, :, 0], maps.D[:, :, 1], maps.D[:, :, 2],
            maps.v[:, :, 0], maps.v[:, :, 1], maps.v[:, :, 2],
            maps.adc, maps.cancer.astype(float)]
    fig, axes = plt.subplots(2, 4, figsize=(14, 7))
    for ax, name, img in zip(axes.ravel(), names, imgs):
        im = ax.imshow(img, cmap="turbo" if name != "cancer" else "gray")
        ax.set_title(name)
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.suptitle(f"slice {_slice}")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"maps_slice_{_slice}.png"), dpi=110)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--master_mats", nargs="*", default=None,
                   help="paths to master.mat files (else synthesize from anon_data)")
    p.add_argument("--epochs", type=int, default=2500)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--mapping_size", type=int, default=128)
    p.add_argument("--limit_patients", type=int, default=1)
    p.add_argument("--slices", type=int, nargs="*", default=None,
                   help="slice indices for tissue maps (default: middle slice)")
    p.add_argument("--nlls_iters", type=int, default=40)
    p.add_argument("--tissue_fit", choices=("nlls", "pia"), default="nlls",
                   help="3-compartment fitter for tissue maps: the projected-LM "
                   "NLLS (reference behavior) or the amortized PIA encoder "
                   "(~63x faster at production voxel counts; "
                   "results/round3_pia/recovery_rangetrain.json)")
    p.add_argument("--pia_ckpt", default=None,
                   help="params pytree for --tissue_fit pia (cli/pia.py --out); "
                   "else a fresh noise-range pretrain runs first")
    p.add_argument("--pia_train_steps", type=int, default=4000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="hybrid_results")
    args = p.parse_args(argv)

    cfg = HybridConfig(
        number_of_epochs=args.epochs,
        hidden_dim=args.hidden_dim,
        num_layers=args.num_layers,
        mapping_size=args.mapping_size,
        nlls_iters=args.nlls_iters,
    )

    patients = []
    if args.master_mats:
        for path in args.master_mats:
            pt_id = (os.path.basename(os.path.dirname(path))
                     or os.path.splitext(os.path.basename(path))[0])
            hybrid_all, b = superres3d.load_hybrid(path)
            patients.append((pt_id, hybrid_all, np.asarray(b)))
    else:
        rows = available_patients()[: args.limit_patients]
        b_values = (0.0, 150.0, 1000.0, 1500.0)
        for row in rows:
            pt_no = row["pt_id"].split("-")[-1]
            b0 = np.asarray(
                load_mat(
                    os.path.join(
                        os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data"),
                        f"pat{pt_no}_mean_b0.mat",
                    ),
                    "data_mean_b0",
                    prefer_native=True,
                ),
                dtype=np.float32,
            )
            hybrid_all = synthetic.hybrid_from_b0(b0, b_values=b_values, seed=int(pt_no))
            patients.append((pt_no, hybrid_all, np.asarray(b_values)))

    if not patients:
        p.error("no patients found")

    fitter = None
    if args.tissue_fit == "pia":
        fitter = make_pia_fitter(params_path=args.pia_ckpt,
                                 train_steps=args.pia_train_steps,
                                 seed=args.seed)

    for pt_id, hybrid_all, bvalues in patients:
        out_dir = os.path.join(args.out, f"pat{pt_id}")
        os.makedirs(out_dir, exist_ok=True)
        hybrid = mean_over_acquisitions(hybrid_all)
        result = fit_all_te(hybrid, cfg, seed=args.seed)
        S = result.recon_hybrid.shape[2]
        slices = args.slices if args.slices else [S // 2]
        for _slice in slices:
            maps = tissue_maps(result, bvalues, _slice=_slice,
                               nlls_iters=cfg.nlls_iters, fitter=fitter)
            np.savez_compressed(
                os.path.join(out_dir, f"maps_slice_{_slice}.npz"),
                D=maps.D, T2=maps.T2, v=maps.v, adc=maps.adc, cancer=maps.cancer,
            )
            _save_maps_png(maps, out_dir, _slice)
            frac = float(maps.cancer.mean())
            print(f"pat{pt_id} slice {_slice}: cancer-map fraction {frac:.4f}")
        print(f"pat{pt_id}: maps in {out_dir}")


if __name__ == "__main__":
    main()
