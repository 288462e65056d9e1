#!/usr/bin/env python
"""Physical-phantom sanity checks — the kiwi / water-phantom protocol.

Reference: superres-perturb.ipynb cell 9 fits the perturbed INR on kiwi-fruit
phantom scans; superres.ipynb cell 5 runs a water-phantom case. The point of
both: on objects whose ground truth is *known by construction* (a uniform
water disk; a kiwi's radial wedge structure), the SR pipeline must not
hallucinate structure (water) and must preserve real structure (kiwi).

The physical scans aren't distributed, so this example synthesizes the two
phantoms with the same acquisition model as the patient data (sub-pixel
inter-acquisition shifts + Rician noise) and checks:

1. WATER: the SR reconstruction stays uniform inside the disk —
   coefficient of variation within 2x of the acquisition mean's.
2. KIWI: SR preserves the wedge structure — masked SSIM vs the clean
   phantom >= the spline baseline's.

Run: python examples/phantom_sanity.py  (CPU-capable, ~1 min)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def water_phantom(side: int = 64) -> np.ndarray:
    # zero background (air): keeps masked_ssim_protocol's hr > 0.05 mask on
    # the object (a 0.05 background normalized by max 0.95 sneaks past the
    # threshold and silently unmasks the whole frame) and makes the Rayleigh
    # noise ROI genuinely signal-free
    y, x = (np.mgrid[0:side, 0:side] / side - 0.5) * 2
    r = np.sqrt(x**2 + y**2)
    return np.where(r < 0.75, 1.0, 0.0).astype(np.float32)


def kiwi_phantom(side: int = 64, wedges: int = 12) -> np.ndarray:
    """Radial wedge pattern + bright core + rind — a kiwi cross-section."""
    y, x = (np.mgrid[0:side, 0:side] / side - 0.5) * 2
    r = np.sqrt(x**2 + y**2)
    theta = np.arctan2(y, x)
    wedge = 0.5 + 0.35 * np.cos(wedges * theta) * np.clip((r - 0.12) / 0.6, 0, 1)
    img = np.where(r < 0.72, wedge, 0.0)  # zero background: see water_phantom
    img = np.where(r < 0.12, 0.95, img)  # core
    img = np.where((r >= 0.72) & (r < 0.8), 0.35, img)  # rind
    return img.astype(np.float32)


def acquisitions(img: np.ndarray, num_acq: int = 9, seed: int = 0) -> np.ndarray:
    """The SAME acquisition model as the patient data: shifts + Rician via
    data/synthetic.acquisitions_from_b0 (b=0 -> no diffusion decay; no
    outliers), instead of a drifting private re-implementation."""
    from mri_super_resolution_tpu.data.synthetic import acquisitions_from_b0

    return acquisitions_from_b0(
        img[:, :, None], num_acq, b=0.0, seed=seed,
        noise_sigma_frac=0.02, shift_sigma=0.5, outlier_prob=0.0,
    )[:, :, 0, :]


def run_phantom(name: str, img: np.ndarray, out_dir: str) -> dict:
    import jax.numpy as jnp

    from mri_super_resolution_tpu.core.metrics import masked_ssim_protocol
    from mri_super_resolution_tpu.pipelines import inr_erd, lowres_qual

    acq = acquisitions(img)
    H, W = img.shape
    case = inr_erd.ERDCase(
        pt_id=f"phantom-{name}",
        b=(0.0, 150.0, 1000.0, 1500.0),
        cancer_loc=(H // 2, W // 2),
        contralateral_loc=(H // 4, W // 4),
        noise=(4, 4),
        cancer_slice=0,
        b0=(img + 0.1)[:, :, None],
        b3=acq[:, :, None, :],
    )
    cfg = lowres_qual.LowresQualConfig(loss_threshold=2e-4, phase2_steps=50,
                                      max_pretrain_steps=30_000)
    res = lowres_qual.run_slice(case, 0, cfg, seed=0)

    clean = img / (img.max() + 1e-12)
    ssim_sr_clean = float(masked_ssim_protocol(jnp.asarray(clean), jnp.asarray(res.sr)))
    ssim_sp_clean = float(masked_ssim_protocol(jnp.asarray(clean), jnp.asarray(res.spline)))

    mask = clean > 0.5
    cv = lambda a: float(np.std(a[mask]) / (np.mean(a[mask]) + 1e-12))
    row = {
        "phantom": name,
        "ssim_sr_vs_clean": round(ssim_sr_clean, 4),
        "ssim_spline_vs_clean": round(ssim_sp_clean, 4),
        "cv_acq_mean": round(cv(res.gt), 4),
        "cv_sr": round(cv(res.sr), 4),
    }

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 4, figsize=(16, 4))
        for a, (im, title) in enumerate(
            [(res.lr, "LR"), (res.spline, "spline"), (res.sr, "SR"), (clean, "clean phantom")]
        ):
            ax[a].imshow(im, cmap="gray")
            ax[a].set_title(f"{name}: {title}")
            ax[a].axis("off")
        os.makedirs(out_dir, exist_ok=True)
        fig.savefig(os.path.join(out_dir, f"{name}.png"), bbox_inches="tight")
        plt.close(fig)
    except Exception:
        pass
    return row


def main():
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "results", "phantom_sanity")
    rows = [
        run_phantom("water", water_phantom(), out_dir),
        run_phantom("kiwi", kiwi_phantom(), out_dir),
    ]
    import json

    for row in rows:
        print(json.dumps(row))

    water, kiwi = rows
    # sanity gates (the point of a phantom)
    assert water["cv_sr"] < 2.0 * max(water["cv_acq_mean"], 0.01), (
        "water phantom: SR hallucinated structure")
    assert kiwi["ssim_sr_vs_clean"] >= kiwi["ssim_spline_vs_clean"] - 0.05, (
        "kiwi phantom: SR lost structure vs spline")
    print("phantom sanity OK")


if __name__ == "__main__":
    main()
