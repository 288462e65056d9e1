#!/usr/bin/env python
"""Round-5 quality reconciliation, experiment 1: GT-noise ladder + exact
clean-GT arm for the 3-D cohort protocol (VERDICT r4 Next #1).

Round 4 left the framework's quality story internally inconsistent:

  - round3_lowres_split (2-D ERD pipeline, real-b0 synthetic acqs with 8%
    outliers + sigma=0.6 shifts): SR beats spline 59/87 on masked SSIM.
  - round4_presets/cohort_ab.json (3-D plain-mean-fit pipeline, benign
    synthetic acqs, held-out-3 GT): spline beats every SR arm (725/870).
  - cohort_ab_cleangt.json (held-out-9 GT): spline's absolute lead GREW —
    the opposite of what a "noisy GT biases SSIM against smooth SR" story
    predicts.

This script settles the 3-D side by scoring ONE set of fits per patient
against a ladder of ground truths with monotonically decreasing noise:
held-out means over k in {3, 9, 18, 36} acquisitions per b, plus the EXACT
zero-noise, zero-motion clean signal the synthetic generator now exposes
(synthetic.hybrid_from_b0(return_clean=True)). The SR and spline outputs
depend only on the 3 input acquisitions, so the margin trend across rungs
is pure GT-noise effect — no refitting confound.

Two mechanism probes ride along:

  - oracle clean-input arms: the same two presets fit on the NOISE-FREE
    input (1 clean acquisition per b), scored against the clean GT. This
    isolates pure interpolator quality (INR-of-decimated-samples vs
    anti-aliased cubic spline) from all noise/outlier handling.
  - the round-3 noise-correlation confound check, ported to 3-D: corr of
    (GT_k - clean) with (spline_noisy - spline_cleaninput) and with
    (SR_noisy - SR_cleaninput) per rung. Under the split protocol these
    must be ~0 — i.e. the 3-D spline win is NOT the round-2 protocol
    confound coming back.

Reference protocol being judged: superresDWI.py:179-187 (SSIM of SR and
spline vs HR mean, mask > 0.05). Companion experiment:
scripts/round5_lowres_regime.py (2-D side). Analysis:
results/round5_quality/README.md.

Writes results/round5_quality/ladder.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=10)
    ap.add_argument("--acq_input", type=int, default=3)
    ap.add_argument("--rungs", type=int, nargs="*", default=[3, 9, 18, 36])
    ap.add_argument("--shift_sigma", type=float, default=None,
                    help="override the generator's per-acquisition motion "
                    "(default: hybrid_from_b0's 0.4 px). 0.0 is the causal "
                    "test of the blur mechanism: if the held-out-mean GT's "
                    "spline preference comes from motion blur, it must "
                    "vanish here and every rung must match the clean rung")
    ap.add_argument("--out", default="results/round5_quality/ladder.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.config import PRESETS, SupperresDWIConfig
    from mri_super_resolution_tpu.core.interp import rescale
    from mri_super_resolution_tpu.core.metrics import masked_ssim_protocol
    from mri_super_resolution_tpu.core.normalize import max_normalize
    from mri_super_resolution_tpu.data import available_patients, load_mat
    from mri_super_resolution_tpu.data import synthetic
    from mri_super_resolution_tpu.pipelines import superres3d

    cfg_ref = SupperresDWIConfig()
    q = {k: v for k, v in PRESETS["quality"].items()
         if k in {f.name for f in dataclasses.fields(SupperresDWIConfig)}}
    cfg_quality = dataclasses.replace(SupperresDWIConfig(), **q)
    arms = {"reference": cfg_ref, "quality": cfg_quality}

    b_values = (0.0, 150.0, 1000.0, 1500.0)
    n_in = args.acq_input
    n_tot = n_in + max(args.rungs)
    rows = available_patients()[: args.patients]
    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    r0, r1 = cfg_ref.roi_start, cfg_ref.roi_end

    # jitted per-(slice, b) masked-SSIM table — identical normalization and
    # mask discipline to scripts/preset_cohort_ab.py (protocol continuity)
    @jax.jit
    def ssim_table(gt_vol, img_vol):
        gts = jnp.moveaxis(gt_vol, (2, 3), (0, 1)).reshape(-1, *gt_vol.shape[:2])
        ims = jnp.moveaxis(img_vol, (2, 3), (0, 1)).reshape(-1, *img_vol.shape[:2])

        def one(gt_im, im):
            return masked_ssim_protocol(max_normalize(gt_im), max_normalize(im))

        return jax.vmap(one)(gts, ims)

    @jax.jit
    def spline_vol(lr_vol, like):
        """(lx, ly, S, 3) -> anti-aliased cubic 2x upsample, cropped to
        ``like``'s spatial shape (the cohort A/B spline arm)."""
        lrs = jnp.moveaxis(lr_vol, (2, 3), (0, 1)).reshape(-1, *lr_vol.shape[:2])
        ups = jax.vmap(lambda im: rescale(im, 2, anti_aliasing=True))(lrs)
        ups = ups[:, : like.shape[0], : like.shape[1]]
        return jnp.moveaxis(
            ups.reshape(like.shape[2], like.shape[3], *like.shape[:2]),
            (0, 1), (2, 3))

    rung_names = [f"heldout{k}" for k in args.rungs] + ["clean"]
    # per rung per arm: list of (spline_ssim, sr_ssim) rows
    table = {rn: {a: [] for a in arms} for rn in rung_names}
    oracle = {a: [] for a in arms}
    oracle_spline = []
    corr_acc = {rn: {"spline": [], "sr_reference": [], "sr_quality": []}
                for rn in rung_names[:-1]}
    timings = {a: [] for a in arms}

    for row in rows:
        pt_no = row["pt_id"].split("-")[-1]
        t_syn = time.perf_counter()
        b0 = np.asarray(load_mat(
            os.path.join(data_dir, f"pat{pt_no}_mean_b0.mat"),
            "data_mean_b0", prefer_native=True), dtype=np.float32)
        gen_kw = {}
        if args.shift_sigma is not None:
            gen_kw["shift_sigma"] = args.shift_sigma
        full, clean = synthetic.hybrid_from_b0(
            b0, b_values=b_values, acq_counts=(1, n_tot, n_tot, n_tot),
            seed=int(pt_no), return_clean=True, dedup_te=True, **gen_kw)
        inp = [[None] * 4 for _ in range(4)]
        inp_clean = [[None] * 4 for _ in range(4)]
        for b in range(4):
            for te in range(4):
                arr = np.asarray(full[b][te], dtype=np.float32)
                cl = np.asarray(clean[b][te], dtype=np.float32)
                if b == 0:
                    inp[b][te] = arr
                    inp_clean[b][te] = cl
                else:
                    inp[b][te] = arr[..., :n_in]
                    inp_clean[b][te] = cl[..., None]
        print(f"pat{pt_no}: synth {time.perf_counter() - t_syn:.1f}s",
              flush=True)

        # ground truths (ROI, b1..b3, TE0)
        gts = {}
        for k in args.rungs:
            gt = np.stack([full[b][0][..., n_in:n_in + k].mean(-1)
                           for b in (1, 2, 3)], axis=-1)
            gts[f"heldout{k}"] = jnp.asarray(gt[r0:r1, r0:r1])
        clean_gt = np.stack([clean[b][0] for b in (1, 2, 3)], axis=-1)
        gts["clean"] = jnp.asarray(clean_gt[r0:r1, r0:r1])

        sr_vols, sr_clean_vols = {}, {}
        spline_noisy = spline_clean = None
        for arm, cfg in arms.items():
            res = superres3d.run_patient(inp, np.asarray(b_values), cfg,
                                         seed=0, pt_id=pt_no)
            sr_vols[arm] = jnp.asarray(res.sr_hr_grid[..., 1:4])
            if spline_noisy is None:
                lr = jnp.asarray(res.mean_img[r0:r1:2, r0:r1:2][..., 1:4])
                spline_noisy = spline_vol(lr, gts["clean"])
            timings[arm].append(
                {k_: round(v, 3) for k_, v in res.timings.items()
                 if isinstance(v, float)})

            res_c = superres3d.run_patient(inp_clean, np.asarray(b_values),
                                           cfg, seed=0, pt_id=pt_no)
            sr_clean_vols[arm] = jnp.asarray(res_c.sr_hr_grid[..., 1:4])
            if spline_clean is None:
                lr_c = jnp.asarray(
                    res_c.mean_img[r0:r1:2, r0:r1:2][..., 1:4])
                spline_clean = spline_vol(lr_c, gts["clean"])

            # oracle: clean input vs clean GT
            oracle[arm].extend(np.asarray(
                ssim_table(gts["clean"], sr_clean_vols[arm])).tolist())
        oracle_spline.extend(np.asarray(
            ssim_table(gts["clean"], spline_clean)).tolist())

        for rn in rung_names:
            sp_s = np.asarray(ssim_table(gts[rn], spline_noisy))
            for arm in arms:
                sr_s = np.asarray(ssim_table(gts[rn], sr_vols[arm]))
                table[rn][arm].extend(zip(sp_s.tolist(), sr_s.tolist()))

        # noise-correlation confound check (round-3 mechanism, 3-D port):
        # GT noise vs arm-output noise, raw ROI voxels
        cg = np.asarray(gts["clean"])
        sp_err = (np.asarray(spline_noisy) - np.asarray(spline_clean)).ravel()
        sr_err = {a: (np.asarray(sr_vols[a])
                      - np.asarray(sr_clean_vols[a])).ravel() for a in arms}
        for rn in rung_names[:-1]:
            gt_noise = (np.asarray(gts[rn]) - cg).ravel()
            corr_acc[rn]["spline"].append(
                float(np.corrcoef(gt_noise, sp_err)[0, 1]))
            for a in arms:
                corr_acc[rn][f"sr_{a}"].append(
                    float(np.corrcoef(gt_noise, sr_err[a])[0, 1]))
        print(f"pat{pt_no}: done", flush=True)

    from scipy import stats

    def rung_summary(rows_):
        sp = np.array([r[0] for r in rows_])
        sr = np.array([r[1] for r in rows_])
        d = sr - sp
        wins = int((d > 0).sum())
        return {
            "n": len(d),
            "spline_ssim_mean": round(float(sp.mean()), 5),
            "sr_ssim_mean": round(float(sr.mean()), 5),
            "sr_beats_spline_rows": f"{wins}/{len(d)}",
            "mean_delta_sr_minus_spline": round(float(d.mean()), 5),
            "median_delta": round(float(np.median(d)), 5),
            "sign_test_p": float(stats.binomtest(wins, len(d), 0.5).pvalue),
        }

    out = {
        "protocol": "split-acquisition masked SSIM, one fit per "
                    f"(patient, arm) on {n_in} input acquisitions/b, scored "
                    f"against held-out-mean GTs k={args.rungs} and the exact "
                    "clean signal; plus oracle clean-input arms",
        "platform": jax.devices()[0].platform,
        "patients": len(rows),
        "shift_sigma": args.shift_sigma,
        "rungs": {rn: {a: rung_summary(table[rn][a]) for a in arms}
                  for rn in rung_names},
        "oracle_clean_input_vs_clean_gt": {
            **{a: {"sr_ssim_mean": round(float(np.mean(oracle[a])), 5)}
               for a in arms},
            "spline_ssim_mean": round(float(np.mean(oracle_spline)), 5),
            "note": "pure interpolator quality: noise-free input, exact GT",
        },
        "noise_correlation": {
            rn: {k: round(float(np.mean(v)), 4)
                 for k, v in corr_acc[rn].items()}
            for rn in rung_names[:-1]
        },
        "per_patient_timings": timings,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for rn in rung_names:
        print(rn, json.dumps({a: out["rungs"][rn][a]["mean_delta_sr_minus_spline"]
                              for a in arms}))
    print("oracle", json.dumps(out["oracle_clean_input_vs_clean_gt"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
