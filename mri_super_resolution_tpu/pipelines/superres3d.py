"""3-D volume FF-INR + PerturbNet super-resolution — the superresDWI pipeline.

Reference: implicit-neural-representations/superresDWI.py:24-248. Per patient:
load hybrid master.mat -> per-(b, TE) max-normalise -> expand all cross-b
acquisition combinations at TE index 0 -> mean volume -> crop ROI, take ::2 as
LR -> fit FF-SIREN(2*128 -> 512x3) 2490 epochs on the LR mean + 10 alternating
INR/PerturbNet epochs -> dense-grid inference at 2x HR and coronal grids ->
SSIM protocol CSV + ADC maps + PNG panels.

TPU-native restructuring:
- combination expansion is one broadcast (data/combinations.py) instead of a
  32-process Pool;
- the whole 2500-epoch schedule is a single jitted scan
  (fit/engine.fit_alternating_pn), double-Fourier-mapping quirk preserved;
- dense-grid inference is chunked on device (fit/engine.infer_grid);
- per-voxel np.polyfit ADC is the closed-form vectorised adc_polyfit.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.config import SupperresDWIConfig
from mri_super_resolution_tpu.core.adc import adc_polyfit
from mri_super_resolution_tpu.core.coords import fourier_matrix, fourier_encode, mgrid
from mri_super_resolution_tpu.core.interp import rescale
from mri_super_resolution_tpu.core.metrics import masked_ssim_protocol
from mri_super_resolution_tpu.core.normalize import max_normalize
from mri_super_resolution_tpu.data import (
    MetricsCSV,
    SSIM_HEADER,
    combination_mean,
    expand_combinations,
    load_mat,
)
from mri_super_resolution_tpu.fit.engine import (
    fit_alternating_pn,
    infer_dense_grid,
)
from mri_super_resolution_tpu.models import Siren, PerturbNet
from mri_super_resolution_tpu.fit.optim import cached_adam, restart_adam

Array = jax.Array


def _identity(x):
    """pn_encode for raw-coordinate models (no Fourier re-mapping);
    module-level so it is identity-stable across patients (static jit arg)."""
    return x


def _grid_model(cfg: SupperresDWIConfig):
    """The pipeline's GridINR from its config — single construction point so
    every consumer (fit, coronal pass, serving export, tests) builds the
    same param tree."""
    from mri_super_resolution_tpu.models import GridINR

    return GridINR(
        num_levels=cfg.grid_levels,
        base_resolution=cfg.grid_base_resolution,
        features_per_level=cfg.grid_features,
        hidden=cfg.grid_hidden,
        z_divisor=cfg.grid_z_divisor,
    )


def _wire_model(cfg: SupperresDWIConfig):
    """The pipeline's Wire INR from its config (single construction point,
    same rationale as :func:`_grid_model`)."""
    from mri_super_resolution_tpu.models import Wire

    return Wire(
        hidden_features=cfg.wire_hidden,
        hidden_layers=cfg.wire_layers,
        omega_0=cfg.wire_omega,
        sigma_0=cfg.wire_sigma,
        trainable=cfg.wire_trainable,
    )


@dataclasses.dataclass
class SR3DResult:
    recon_2x: np.ndarray  # (2sx, 2sy, S, 4) super-resolved at 2x
    sr_hr_grid: np.ndarray  # (sx, sy, S, 4) INR sampled on the HR grid
    mean_img: np.ndarray  # (X, Y, S, 4) combination-mean volume
    maxes: np.ndarray  # (4, 4) per-(b, TE) normalisation maxes
    bvalues: np.ndarray
    ssim_rows: list[tuple]
    inr_params: object
    pn_params: object
    B: np.ndarray
    # end-to-end phase wall-clock (seconds), device-fenced at each boundary:
    # prep / setup / fit / infer / eval + total. First patient of a process
    # includes XLA compiles; warm numbers are the per-patient steady state.
    timings: dict = dataclasses.field(default_factory=dict)


def load_hybrid(data_address: str):
    """Load master.mat's hybrid_raw nested list + b-values
    (superresDWI.py:40-48), with first-contact schema validation: missing
    variables, a non-4x4 cell, or inconsistent per-(b, TE) volume shapes
    raise precise messages naming the file and the offending entry rather
    than failing deep inside the fit."""
    data = load_mat(data_address)
    for var in ("hybrid_raw", "b"):
        if var not in data:
            raise ValueError(
                f"{data_address}: missing variable {var!r} "
                f"(master.mat needs 'hybrid_raw' — a 4x4 cell of per-(b, TE)"
                f" acquisition stacks, superresDWI.py:45 — and 'b', the "
                f"b-value row); file contains {sorted(data)}"
            )
    hybrid = data["hybrid_raw"]
    try:
        n_b, n_te = len(hybrid), len(hybrid[0])
    except (TypeError, IndexError) as e:
        raise ValueError(
            f"{data_address}: 'hybrid_raw' is not a cell array "
            f"({type(hybrid).__name__}): {e}"
        ) from e
    if n_b != 4 or n_te != 4:
        raise ValueError(
            f"{data_address}: 'hybrid_raw' cell is {n_b}x{n_te}, expected "
            "4 b-values x 4 TEs (superresHybrid.py:44-55)"
        )
    spatial = None
    for b in range(4):
        for te in range(4):
            arr = np.asarray(hybrid[b][te])
            if arr.ndim not in (3, 4):
                raise ValueError(
                    f"{data_address}: hybrid_raw[{b}][{te}] has shape "
                    f"{arr.shape}; expected (X, Y, S) or (X, Y, S, n_acq)"
                )
            if spatial is None:
                spatial = arr.shape[:3]
            elif arr.shape[:3] != spatial:
                raise ValueError(
                    f"{data_address}: hybrid_raw[{b}][{te}] spatial shape "
                    f"{arr.shape[:3]} != {spatial} of hybrid_raw[0][0]"
                )
    bvals = np.asarray(data["b"], dtype=np.float64).reshape(-1)
    if bvals.size != 4:
        raise ValueError(
            f"{data_address}: 'b' has {bvals.size} entries, expected 4"
        )
    return hybrid, bvals


def normalize_hybrid(hybrid_raw) -> tuple[list, np.ndarray]:
    """Per-(b, TE) max normalisation (superresDWI.py:50-55)."""
    maxes = np.zeros((4, 4))
    normed = [[None] * 4 for _ in range(4)]
    for b in range(4):
        for te in range(4):
            arr = np.asarray(hybrid_raw[b][te], dtype=np.float32)
            maxes[b, te] = arr.max()
            normed[b][te] = arr / maxes[b, te]
    return normed, maxes


def run_patient(
    hybrid_raw,
    bvalues: np.ndarray,
    cfg: SupperresDWIConfig,
    seed: int = 0,
    csv: MetricsCSV | None = None,
    pt_id: str | int = 0,
) -> SR3DResult:
    """Fit one patient volume and compute the evaluation protocol."""
    t0 = time.perf_counter()
    normed, maxes = normalize_hybrid(hybrid_raw)
    # the combination mean factorizes (combination_mean docstring), and the
    # full Cartesian product is only ever consumed on the LR ROI voxels —
    # expand just those on device instead of the whole (X,Y,S,4,N) volume
    mean_img = combination_mean(normed, te=0)  # (X, Y, S, 4)

    r0, r1 = cfg.roi_start, cfg.roi_end
    lr_mean = mean_img[r0:r1:2, r0:r1:2]  # (sx/2, sy/2, S, 4)
    hr_mean = mean_img[r0:r1, r0:r1]
    lr_acqs = expand_combinations(*[
        jnp.asarray(np.asarray(normed[b][0], dtype=np.float32)[r0:r1:2, r0:r1:2])
        for b in range(4)
    ])  # (sx/2, sy/2, S, 4, N), device-resident
    num_comb = lr_acqs.shape[-1]

    dim = lr_mean.ndim  # 4
    if cfg.inr_model not in ("siren", "grid", "wire"):
        raise ValueError(f"unknown inr_model {cfg.inr_model!r}")
    use_grid = cfg.inr_model == "grid"
    use_wire = cfg.inr_model == "wire"
    key = jax.random.key(seed)
    kB, kI, kP = jax.random.split(key, 3)
    B = fourier_matrix(kB, cfg.mapping_size, dim, scale=cfg.ff_scale)

    lr_coords = mgrid(lr_mean.shape)
    # the INR's input stream: FF-encoded coords for SIREN (reference), raw
    # coords for the dense-grid model (its multires grids ARE the encoding)
    # and for WIRE (the Gabor layer is its own frequency lift)
    ff = fourier_encode(lr_coords, B) if cfg.inr_model == "siren" else lr_coords
    mean_target = jnp.asarray(lr_mean.reshape(-1, 1))
    acq_pixels = jnp.moveaxis(
        lr_acqs.reshape(-1, num_comb), -1, 0
    )[..., None]  # (N, P, 1), stays on device

    # fence the async device work (expand_combinations + moveaxis) so its
    # time lands in prep_s, not fit_s — device_get of one element blocks
    # until the producing computation is done
    jax.device_get(acq_pixels[0, 0])
    t_prep = time.perf_counter()

    pn = PerturbNet(hidden_features=cfg.pn_dim, dimension=dim)
    pn_params = pn.init(kP, ff[:8], 0, 0.0)

    on_tpu = jax.devices()[0].platform == "tpu"
    inr_vag = None
    padded_ff = padded_target = None
    pn_encode = None
    infer_apply = None  # inference-only apply override (wire fused forward)
    if use_grid:
        from mri_super_resolution_tpu.models.grid_inr import (
            build_z_aux,
            make_zbucket_value_and_grad,
            pad_target_z,
            z_bucket_for,
        )

        inr = _grid_model(cfg)
        inr_params = inr.init(kI, ff[:8])
        # mean-fit epochs ride the separable tensor-product path (the fit
        # grid IS mgrid(lr_shape)) with the z axis padded to a power-of-two
        # BUCKET: the heavy scanned program is keyed on (nx, ny, z_bucket),
        # not the patient's slice count, so a cohort with heterogeneous S
        # shares one executable (grid_inr.py "z-bucketed fit path"). The PN
        # branch keeps the gather apply — perturbed coords are no longer a
        # tensor grid. All callables are identity-stable (cached by value).
        inr_apply = inr.apply
        pn_encode = _identity
        lr_shape = tuple(int(s) for s in lr_mean.shape)
        z_bucket = z_bucket_for(lr_shape[2])
        inr_vag = make_zbucket_value_and_grad(
            inr, lr_shape[0], lr_shape[1], z_bucket, lr_shape[3]
        )
        padded_ff = build_z_aux(inr, lr_shape[2], z_bucket)  # rides coords slot
        padded_target = pad_target_z(mean_target, lr_shape, z_bucket)
    elif use_wire:
        inr = _wire_model(cfg)
        inr_params = inr.init(kI, ff[:8])
        pn_encode = _identity  # PN output is raw coords for the Gabor stack
        # the engine's PN phase differentiates THROUGH inr_apply wrt its
        # input (engine.py pn_update); the fused Gabor forward has no VJP
        # (unlike the SIREN kernel's), so the engine gets the XLA apply and
        # only the mean-fit steps ride the one-pass kernel via inr_vag.
        # Inference uses the fused forward (no gradients there).
        inr_apply = inr.apply
        if on_tpu:
            from mri_super_resolution_tpu.ops.pallas.wire_kernel import (
                make_wire_fused_apply,
                make_wire_value_and_grad,
                wire_kernel_fits,
            )

            # wide configs overflow Mosaic's scoped-VMEM stack (the fused
            # kernels pin weights(+grads+stash) per tile) — those stay on
            # XLA autodiff, which streams weights from HBM. trainable
            # omega/sigma also needs autodiff (their grads flow only there);
            # the fused INFERENCE forward stays valid either way — it reads
            # the scalars out of the params tree.
            if wire_kernel_fits(inr, backward=False):
                infer_apply = make_wire_fused_apply(inr)
            if not inr.trainable and wire_kernel_fits(inr):
                inr_vag = make_wire_value_and_grad(inr)
    else:
        inr = Siren(hidden_features=cfg.hidden_dim, hidden_layers=cfg.num_layers)
        inr_params = inr.init(kI, ff[:8])
        if cfg.use_pallas and on_tpu:
            from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
                make_fused_apply,
                make_fused_value_and_grad,
                pad_rows_to,
            )

            inr_apply = make_fused_apply(inr)
            # one-pass mean-fit steps; pre-padded coords hoist the per-step
            # pad out of the 2490-epoch scan (make_fused_value_and_grad docs)
            inr_vag = make_fused_value_and_grad(inr, n_rows=ff.shape[0])
            padded_ff = pad_rows_to(ff, 512)
            padded_target = pad_rows_to(mean_target, 512)
        else:
            inr_apply = inr.apply

    # inr_restart_every > 0: periodic Adam-moment restarts (fit/optim.py) —
    # measured faster time-to-PSNR AND higher final plateau than flat Adam
    inr_lr = (cfg.grid_lr if use_grid
              else cfg.wire_lr if use_wire else cfg.inr_lr)
    inr_tx = (restart_adam(inr_lr, cfg.inr_restart_every)
              if cfg.inr_restart_every else cached_adam(inr_lr))
    t_setup = time.perf_counter()
    if use_grid:
        # two programs: the z-bucketed mean fit (one executable per slice
        # BUCKET — the 15-30 s compile no longer recurs per novel slice
        # count) + the small PN alternation tail at the correct absolute
        # epoch parity, continuing the same optimizer state
        from mri_super_resolution_tpu.fit.engine import (
            AlternatingResult,
            fit_simple,
        )

        mean_steps = cfg.number_of_epochs - cfg.perturbation_epochs
        res1 = fit_simple(
            inr_apply, inr_tx, inr_params, padded_ff, padded_target,
            mean_steps, value_and_grad_fn=inr_vag,
        )
        if cfg.perturbation_epochs:
            res2 = fit_alternating_pn(
                inr_apply, pn.apply, inr_tx, cached_adam(cfg.pn_lr),
                res1.params, pn_params, ff, mean_target, acq_pixels, B,
                num_epochs=cfg.perturbation_epochs,
                pn_epochs=cfg.perturbation_epochs,
                pn_eps=cfg.pn_eps,
                inr_value_and_grad=inr_vag,
                padded_ff=padded_ff,
                padded_target=padded_target,
                inr_opt_state=res1.opt_state,
                pn_encode=pn_encode,
                phase2_start=mean_steps,
            )
            res = AlternatingResult(
                res2.inr_params, res2.pn_params,
                jnp.concatenate([res1.losses, res2.losses]),
                res2.inr_opt_state, res2.pn_opt_state,
            )
        else:
            res = AlternatingResult(res1.params, pn_params, res1.losses)
    else:
        res = fit_alternating_pn(
            inr_apply,
            pn.apply,
            inr_tx,
            cached_adam(cfg.pn_lr),
            inr_params,
            pn_params,
            ff,
            mean_target,
            acq_pixels,
            B,
            num_epochs=cfg.number_of_epochs,
            pn_epochs=cfg.perturbation_epochs,
            pn_eps=cfg.pn_eps,
            inr_value_and_grad=inr_vag,
            padded_ff=padded_ff,
            padded_target=padded_target,
            pn_encode=pn_encode,
        )

    # fence the scanned fit (device_get: block_until_ready is unreliable on
    # the tunnelled backend — see utils/profiling.py) before the fit mark
    jax.device_get(jax.tree_util.tree_leaves(res.inr_params)[0])
    t_fit = time.perf_counter()

    # dense-grid inference (superresDWI.py:161-162): coords generated inside
    # the jitted chunk program — ONE executable across every volume shape in
    # a cohort (heterogeneous slice counts cost no recompiles). The grid
    # model evaluates any mgrid separably instead (infer_tensor_grid).
    hr_shape = hr_mean.shape
    test_shape = (hr_shape[0] * 2, hr_shape[1] * 2, hr_shape[2], hr_shape[3])
    if use_grid:
        # z-bucketed inference: one executable per (in-plane shape, bucket)
        # — novel slice counts pay zero infer compiles (grid_inr.py)
        from mri_super_resolution_tpu.models.grid_inr import (
            infer_tensor_grid_zbucket,
        )

        recon = infer_tensor_grid_zbucket(
            inr, res.inr_params, test_shape, clamp_min=0.0
        ).reshape(test_shape)
        sr_hr = infer_tensor_grid_zbucket(
            inr, res.inr_params, hr_shape, clamp_min=0.0
        ).reshape(hr_shape)
    else:
        infer_B = None if use_wire else B
        infer_fn = infer_apply or inr_apply
        recon = infer_dense_grid(
            infer_fn, res.inr_params, test_shape, clamp_min=0.0,
            fourier_B=infer_B,
        ).reshape(test_shape)
        sr_hr = infer_dense_grid(
            infer_fn, res.inr_params, hr_shape, clamp_min=0.0,
            fourier_B=infer_B,
        ).reshape(hr_shape)
    t_infer = time.perf_counter()

    # SSIM protocol (superresDWI.py:179-187) — the whole (slice x b) table is
    # one vmapped program: eager per-pair evaluation dispatches hundreds of
    # tiny ops through the device tunnel and dominates wall-clock otherwise.
    @jax.jit
    def ssim_table(hr_vol, sr_vol):
        hrs = jnp.moveaxis(hr_vol, (2, 3), (0, 1)).reshape(-1, *hr_vol.shape[:2])
        srs = jnp.moveaxis(sr_vol, (2, 3), (0, 1)).reshape(-1, *sr_vol.shape[:2])

        def one(hr_im, sr_im):
            hr_ref = max_normalize(hr_im)
            # odd ROI sides: rescale(., 2) of the ::2 grid yields
            # 2*ceil(n/2) rows — crop back to the HR shape
            up = rescale(hr_im[::2, ::2], 2, anti_aliasing=True)
            spline = max_normalize(up[: hr_im.shape[0], : hr_im.shape[1]])
            sr_n = max_normalize(sr_im)
            return (
                masked_ssim_protocol(hr_ref, spline),
                masked_ssim_protocol(hr_ref, sr_n),
            )

        return jax.vmap(one)(hrs, srs)

    ssim_sp, ssim_sr = (
        np.asarray(x)
        for x in ssim_table(jnp.asarray(hr_mean), jnp.asarray(sr_hr))
    )
    ssim_rows = []
    for _slice in range(mean_img.shape[2]):
        for b in range(4):
            idx = _slice * 4 + b
            row = (
                pt_id,
                float(bvalues[b]),
                _slice,
                float(ssim_sp[idx]),
                float(ssim_sr[idx]),
            )
            ssim_rows.append(row)
            if csv is not None:
                csv.append(*row)
    t_eval = time.perf_counter()
    timings = {
        "prep_s": t_prep - t0,
        "setup_s": t_setup - t_prep,
        "fit_s": t_fit - t_setup,
        "infer_s": t_infer - t_fit,
        "eval_s": t_eval - t_infer,
        "total_s": t_eval - t0,
        "fit_epochs": cfg.number_of_epochs,
        "lr_voxels": int(mean_target.shape[0]),
        "num_combinations": int(num_comb),
        "inr_model": cfg.inr_model,
    }

    return SR3DResult(
        recon_2x=recon,
        sr_hr_grid=sr_hr,
        mean_img=mean_img,
        maxes=maxes,
        bvalues=bvalues,
        ssim_rows=ssim_rows,
        inr_params=res.inr_params,
        pn_params=res.pn_params,
        B=np.asarray(B),
        timings=timings,
    )


def adc_maps(result: SR3DResult, cfg: SupperresDWIConfig, _slice: int):
    """SR / spline / HR ADC triptych for one slice (superresDWI.py:189-212).

    Rescales each b-channel by maxes[b, te_index] (the TE=70ms column) before
    the polyfit ADC, as the reference does.
    """
    r0, r1 = cfg.roi_start, cfg.roi_end
    scale_b = result.maxes[:, cfg.te_index]

    recon_rescaled = result.recon_2x[:, :, _slice, :] * scale_b
    Hs, Ws = recon_rescaled.shape[:2]
    # odd ROI sides: rescale(., 4) of the ::2 grid overshoots the 2x HR
    # shape by up to 2 rows/cols — crop to the recon grid
    spline = np.stack(
        [
            np.asarray(
                rescale(jnp.asarray(result.mean_img[r0:r1:2, r0:r1:2, _slice, b]), 4, anti_aliasing=True)
            )[:Hs, :Ws]
            * scale_b[b]
            for b in range(4)
        ],
        axis=-1,
    )
    hr = np.stack(
        [
            np.asarray(
                rescale(jnp.asarray(result.mean_img[r0:r1, r0:r1, _slice, b]), 2, anti_aliasing=True)
            )
            * scale_b[b]
            for b in range(4)
        ],
        axis=-1,
    )
    bv = jnp.asarray(result.bvalues)
    return (
        np.asarray(adc_polyfit(bv, jnp.asarray(recon_rescaled))),
        np.asarray(adc_polyfit(bv, jnp.asarray(spline))),
        np.asarray(adc_polyfit(bv, jnp.asarray(hr))),
    )


def coronal_recon(
    result: SR3DResult,
    inr_apply,
    cfg: SupperresDWIConfig,
    transverse_length: int = 100,
) -> np.ndarray:
    """Coronal dense grid pass (superresDWI.py:217-241): sample the INR on a
    (2sx, 2sy, transverse_length, 1) grid for through-plane super-resolution."""
    ts = result.recon_2x.shape
    coronal_shape = (ts[0], ts[1], transverse_length, 1)
    if cfg.inr_model == "grid":
        from mri_super_resolution_tpu.models.grid_inr import infer_tensor_grid

        rec = infer_tensor_grid(_grid_model(cfg), result.inr_params,
                                coronal_shape)
    else:
        B = None if cfg.inr_model == "wire" else jnp.asarray(result.B)
        rec = infer_dense_grid(inr_apply, result.inr_params, coronal_shape,
                               fourier_B=B)
    return np.asarray(rec).reshape(coronal_shape)


def export_triplets(
    results: Sequence[SR3DResult],
    cfg: SupperresDWIConfig,
    out_path: str,
    b_index: int = 3,
    slice_range: tuple[int, int] = (10, 21),
) -> str:
    """Zero-shot LR/GT/SR triplet export — the forbagci.py variant
    (forbagci.py:160-177): per patient x slice, max-normalised HR reference,
    its ::2 LR, and the SR reconstruction at b index ``b_index``, saved
    together as one npz for downstream (external) model benchmarking."""
    r0, r1 = cfg.roi_start, cfg.roi_end
    lr_dataset, gt_dataset, zero_shot_sr = [], [], []
    for result in results:
        hr_img = result.mean_img[r0:r1, r0:r1]
        for _slice in range(*slice_range):
            if _slice >= hr_img.shape[2]:
                continue
            hr_ref = hr_img[:, :, _slice, b_index]
            hr_ref = hr_ref / (hr_ref.max() + 1e-12)
            sr = result.sr_hr_grid[:, :, _slice, b_index]
            sr = sr / (sr.max() + 1e-12)
            gt_dataset.append(hr_ref)
            lr_dataset.append(hr_ref[::2, ::2])
            zero_shot_sr.append(sr)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(
        out_path,
        lr_dataset=np.asarray(lr_dataset),
        gt_dataset=np.asarray(gt_dataset),
        zero_shot_SR=np.asarray(zero_shot_sr),
    )
    return out_path


def run(
    patients: Sequence[tuple[str | int, object, np.ndarray]],
    cfg: SupperresDWIConfig,
    out_dir: str,
    seed: int = 0,
    save_panels: bool = False,
    export_npz: bool = False,
    export_artifact: bool = False,
) -> str:
    """Driver over (pt_id, hybrid_raw, bvalues) tuples; writes
    ssim_scores.csv per patient like superresDWI.py main(). With
    ``export_npz`` additionally writes the forbagci-style triplet archive;
    with ``export_artifact``, each patient's fitted volume INR is exported
    as a self-contained jax.export serving artifact (``pat<id>/artifact/``)
    that maps raw 4-D coords in [-1,1] (x, y, z, b-axis) to normalized
    intensity — any grid density, no model code needed (serve.py)."""
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for pt_id, hybrid_raw, bvalues in patients:
        pdir = os.path.join(out_dir, f"pat{pt_id}")
        os.makedirs(pdir, exist_ok=True)
        csv = MetricsCSV(os.path.join(pdir, "ssim_scores.csv"), SSIM_HEADER)
        result = run_patient(hybrid_raw, bvalues, cfg, seed=seed, csv=csv, pt_id=pt_id)
        results.append(result)
        if save_panels:
            _save_panels(result, cfg, pdir)
        if export_artifact:
            from mri_super_resolution_tpu import serve

            if cfg.inr_model == "grid":
                # separable tensor-product artifact: all three axes symbolic
                # (axis-coordinate vectors in), so the one artifact serves
                # the LR, HR, and 2x recon grids — the pointwise
                # export_inr path would serve gathers, which is the
                # TPU-hostile formulation (models/grid_inr.py round-1 note)
                serve.export_grid_inr(
                    _grid_model(cfg), result.inr_params,
                    os.path.join(pdir, "artifact"),
                    model_desc=(
                        f"sr3d pat{pt_id}: grid_inr L{cfg.grid_levels}"
                        f" R{cfg.grid_base_resolution} h{cfg.grid_hidden};"
                        " output is the (b, te0)-normalized volume —"
                        " de-normalize with manifest['maxes'][b][te]"
                    ),
                    extra_manifest={
                        "maxes": np.asarray(result.maxes).tolist(),
                        "bvalues": np.asarray(result.bvalues).tolist(),
                    },
                )
                inr = None
            elif cfg.inr_model == "wire":
                inr = _wire_model(cfg)
                export_B = None
                desc = (f"sr3d pat{pt_id}: wire {cfg.wire_hidden}x"
                        f"{cfg.wire_layers} w{cfg.wire_omega} s{cfg.wire_sigma}")
            else:
                inr = Siren(hidden_features=cfg.hidden_dim,
                            hidden_layers=cfg.num_layers)
                export_B = result.B
                desc = (f"sr3d pat{pt_id}: siren {cfg.hidden_dim}x"
                        f"{cfg.num_layers} FF{cfg.mapping_size}")
            if inr is not None:
                serve.export_inr(
                    inr.apply, result.inr_params, coord_dim=4,
                    out_dir=os.path.join(pdir, "artifact"),
                    fourier_B=export_B,
                    model_desc=(
                        f"{desc}; output is the (b, te0)-normalized"
                        f" volume — de-normalize with manifest['maxes'][b][te]"
                    ),
                    extra_manifest={
                        # per-(b, TE) normalization scales, so the artifact is
                        # self-contained: physical = output * maxes[b][te]
                        "maxes": np.asarray(result.maxes).tolist(),
                        "bvalues": np.asarray(result.bvalues).tolist(),
                    },
                )
    if export_npz:
        export_triplets(results, cfg, os.path.join(out_dir, "zero_shot_dwi.npz"))
    # per-patient end-to-end phase breakdown (the reference's headline
    # workload has no published timing at all — SURVEY.md section 6); the
    # first patient's row includes XLA compiles, later rows are warm
    with open(os.path.join(out_dir, "timings.json"), "w") as f:
        json.dump(
            {
                "platform": jax.devices()[0].platform,
                "config": {
                    "epochs": cfg.number_of_epochs,
                    "pn_epochs": cfg.perturbation_epochs,
                    "hidden": cfg.hidden_dim,
                    "layers": cfg.num_layers,
                    "mapping_size": cfg.mapping_size,
                },
                "patients": [
                    dict(r.timings, pt_id=str(p[0]))
                    for r, p in zip(results, patients)
                ],
            },
            f,
            indent=1,
        )
    return out_dir


def _save_panels(result: SR3DResult, cfg: SupperresDWIConfig, out_dir: str) -> None:
    """PNG slice panels + ADC triptychs (superresDWI.py:164-212)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    r0, r1 = cfg.roi_start, cfg.roi_end
    for _slice in range(result.mean_img.shape[2]):
        fig, ax = plt.subplots(4, 3, figsize=(15, 20))
        for b in range(4):
            ax[b, 0].imshow(result.recon_2x[:, :, _slice, b], cmap="gray")
            ax[b, 0].set_title(f"super-resolution b={result.bvalues[b]}")
            spline = np.asarray(
                rescale(jnp.asarray(result.mean_img[r0:r1:2, r0:r1:2, _slice, b]), 4, anti_aliasing=True)
            )
            ax[b, 1].imshow(spline, cmap="gray")
            ax[b, 1].set_title("spline interpolation")
            hr = np.asarray(
                rescale(jnp.asarray(result.mean_img[r0:r1, r0:r1, _slice, b]), 2, anti_aliasing=True)
            )
            ax[b, 2].imshow(hr, cmap="gray")
            ax[b, 2].set_title("ground truth")
            for axi in range(3):
                ax[b, axi].axis("off")
        fig.savefig(
            os.path.join(out_dir, f"slice_{_slice}_m_{cfg.mapping_size}_s_{cfg.ff_scale}.png"),
            bbox_inches="tight",
        )
        plt.close(fig)

        adc_sr, adc_sp, adc_hr = adc_maps(result, cfg, _slice)
        fig, ax = plt.subplots(1, 3, figsize=(12, 4))
        for a, (img, title) in enumerate(
            [(adc_sr, "ADC of super-resolution"), (adc_sp, "ADC of spline"), (adc_hr, "ADC of HR")]
        ):
            ax[a].imshow(img, vmin=0.3, vmax=3.0, cmap="gray")
            ax[a].set_title(title)
            ax[a].axis("off")
        fig.savefig(os.path.join(out_dir, f"ADC_slice_{_slice}.png"), bbox_inches="tight")
        plt.close(fig)
