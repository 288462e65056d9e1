"""Dataclass configuration layer feeding every entry point.

The reference scatters hyperparameters across argparse (master.py:25-41),
hard-coded main() bodies (superresDWI.py:84-90), and SLURM positional args
(run.sh). Here one typed config object per pipeline feeds both the library API
and the CLIs; CLIs expose the same flag names the reference used.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Master2DConfig:
    """master.py flags (lines 25-41), defaults preserved."""

    out_folder: str = "experiments/"
    out_img_folder: str = "output_images/"
    total_steps: int = 3000
    seg: int = 150
    hidden_layers: int = 6
    hidden_features: int = 64
    roi_begin: int = 40
    roi_end: int = 100
    learning_rate: float = 3e-4
    scale: int = 3
    exp_name: str = "sr2"
    repeat_time: int = 1
    erd: int = 0  # 0=no ERD, 1=majority vote, 2=intensity-cognisant
    use_pallas: bool = True  # False forces the XLA-autodiff path (A/B runs)


@dataclasses.dataclass
class SupperresDWIConfig:
    """superresDWI.py hard-coded hyperparameters (lines 84-118)."""

    number_of_epochs: int = 2500
    perturbation_epochs: int = 10
    hidden_dim: int = 512
    num_layers: int = 3
    pn_dim: int = 128
    roi_start: int = 40
    roi_end: int = 90
    mapping_size: int = 128
    ff_scale: float = 0.5
    inr_lr: float = 1e-4
    pn_lr: float = 1e-6
    pn_eps: float = 1.0 / 128.0
    te_index: int = 1  # TE=70ms column used for rescaling outputs
    use_pallas: bool = True  # fused SIREN kernel on TPU (31% faster step)
    # >0 switches the INR optimizer to restart_adam(inr_lr, every): periodic
    # Adam-moment restarts measure faster time-to-PSNR than the reference's
    # flat Adam on this fit (fit/optim.py rationale and caveats;
    # results/round3_flagship/time_to_psnr.jsonl). 0 = reference flat.
    inr_restart_every: int = 0
    # "siren" = the reference's FF-SIREN (parity default). "grid" = this
    # framework's multiresolution dense-grid INR (models/grid_inr.py): the
    # mean-fit epochs and all dense-grid inference ride the separable
    # tensor-product path (scatter-free, all-MXU) and the PN alternation
    # uses the gather path on perturbed coords. Far faster to a given
    # quality (bench_quality.py; results/round3_grid3d/). "wire" = the
    # complex-Gabor INR (models/wire.py, INRmodel.py:66-120 re-designed as
    # paired real ops) on raw 4-D coords via the fused Gabor kernel.
    inr_model: str = "siren"
    wire_hidden: int = 256
    wire_layers: int = 2
    # 1e-3 (was 5e-3 through round 4): strictly better in the round-5 sweep
    # at BOTH widths — 256x2 final 51.7 vs 49.5 dB (and faster to 40 dB),
    # 512x2 final 90.3 vs 63.5 dB (results/round5_wire/sweep.json,
    # sweep_combined.json). 5e-3 was over-aggressive for the Gabor params.
    wire_lr: float = 1e-3
    wire_omega: float = 10.0
    wire_sigma: float = 10.0
    # trainable per-layer omega/sigma (the reference's nn.Parameter behavior,
    # INRmodel.py:70-84). Round-5 sweep (results/round5_wire/sweep.json):
    # +6.7 dB final on the flagship ROI fit over fixed scalars, and better
    # PSNR at every wall-clock cutoff despite running on XLA autodiff (the
    # fused kernel requires fixed scalars).
    wire_trainable: bool = False
    grid_levels: int = 4
    grid_base_resolution: int = 6
    grid_features: int = 4
    grid_hidden: int = 64
    grid_lr: float = 5e-3
    # ROI-cropped LR grids (25x25x28) have z as the largest axis — full
    # z resolution per level, unlike the full-volume default of 4
    grid_z_divisor: int = 1


# --------------------------------------------------------------------------
# Presets — one flag reproducing the best committed configurations.
#
# "reference": exact reference behavior (FF-SIREN, flat Adam, 2500 epochs).
# "quality":   grid INR (z_divisor 1) + restart_adam(5e-3, 250) — strictly
#              dominates the reference arm in round-3 evidence: time-to-40dB
#              6.8x faster, finals 66.5-73.8 dB seed-stable vs ~55 dB
#              (results/round3_grid3d/, round3_flagship/time_to_psnr.jsonl),
#              AND wins the downstream split-acquisition masked-SSIM protocol
#              (+0.0042 paired, 161/224; results/round3_lowres_split/).
# "fast":      the quality arm stopped at 600 epochs with the PerturbNet
#              alternation off — past the 40 dB knee with margin; for
#              screening runs where wall-clock beats the last dB.
#
# Keys are CLI flag dests (superres_dwi / cohort_run / superres_hybrid share
# names); each CLI applies the subset of keys it knows via
# argparse.set_defaults, so explicit flags always beat the preset.
PRESETS: dict[str, dict] = {
    "reference": {},
    "quality": {
        "inr_model": "grid",
        "grid_z_divisor": 1,
        "grid_lr": 5e-3,
        "inr_restart_every": 250,
    },
    "fast": {
        "inr_model": "grid",
        "grid_z_divisor": 1,
        "grid_lr": 5e-3,
        "inr_restart_every": 250,
        "epochs": 600,
        "pn_epochs": 0,
    },
}


def add_preset_arg(parser, argv=None) -> None:
    """Add --preset and re-seed the parser's defaults from the chosen preset
    (pre-parses just --preset; explicit flags still override)."""
    parser.add_argument(
        "--preset", choices=sorted(PRESETS), default="reference",
        help="config preset: 'reference' = exact reference behavior; "
        "'quality' = grid INR + restart_adam (dominates reference on "
        "time-to-PSNR, final PSNR, and the SSIM protocol — see "
        "config.PRESETS); 'fast' = quality stopped at 600 epochs, no PN",
    )
    import sys

    args = sys.argv[1:] if argv is None else list(argv)
    pre, _ = parser.parse_known_args(
        [a for a in args if a not in ("--help", "-h")]
    )
    known = {a.dest for a in parser._actions}
    preset = PRESETS[pre.preset]
    applied = {k: v for k, v in preset.items() if k in known}
    dropped = sorted(set(preset) - set(applied))
    if dropped:
        # a CLI that lacks some preset dests would otherwise silently run a
        # degraded configuration (e.g. cohort_run has no inr_model flag, so
        # --preset quality used to fall back to a restart-only SIREN run)
        print(
            f"--preset {pre.preset}: applied {sorted(applied) or 'nothing'}; "
            f"this CLI has no {dropped} flags, those keys are IGNORED",
            file=sys.stderr,
        )
    parser.set_defaults(**applied)


@dataclasses.dataclass
class INRERDConfig:
    """INR_ERD.py hard-coded hyperparameters (lines 162-273)."""

    hidden_features: int = 128
    hidden_layers: int = 3
    pretrain_lr: float = 3e-4
    loss_threshold: float = 2e-5
    perturb_lr: float = 3e-4
    net_lr: float = 1e-7
    perturb_eps: float = 1.0 / 128.0
    soft_erd_mul: float = 1000.0
    soft_erd_slope: float = 20.0
    seeds: int = 10


@dataclasses.dataclass
class RAMSConfig:
    """RAMS network hyperparameters (multi-image-super-resolution/
    master.py:20-27 and utils/network.py:91-155)."""

    scale: int = 3
    filters: int = 32
    kernel_size: int = 3
    channels: int = 9  # T temporal acquisitions
    r: int = 8  # attention compression
    N: int = 12  # number of RFABs
    mean: float = 7433.6436  # PROBA-V normalisation (network.py:18-19)
    std: float = 2353.0723
    # bfloat16 activations (f32 params/accumulators/loss): ~10% faster step
    # at cPSNR parity — measured ±0.055 dB over a 5-epoch A/B on identical
    # data/seeds (results/round3_rams/dtype_parity.json)
    compute_dtype: str = "bfloat16"
    # experimental Pallas path for the 3x3x3 SAME convs (nhwtc layout only;
    # off pending the TPU A/B — scripts/conv_kernel_bench.py)
    conv_kernel: bool = False
    layout: str = "nhwtc"  # "nthwc" cuts elementwise tile-padding 7.1x->4.7x


@dataclasses.dataclass
class TrainerConfig:
    """MISR Trainer knobs (utils/training.py:108-120).

    batch_size keeps the reference default; on the v5e the measured
    throughput optimum is 96 — 878.8 patches/s = 85.7% of the filters=32
    lane-constrained roofline, vs ~400 at 8-32 and a memory cliff at 128
    (results/round4_rams/batch_sweep_hi.json).
    """

    batch_size: int = 32
    buffer_size: int = 512
    epochs: int = 100
    evaluate_every: int = 100
    val_steps: int = 100
    hr_size: int = 96
    learning_rate: float = 1e-4
    # "constant" (the reference recipe) or "cosine" — a single-run stand-in
    # for the reference's manual lr-decayed continuation runs. "cosine"
    # decays learning_rate -> 0 over decay_steps train steps.
    lr_schedule: str = "constant"
    decay_steps: int = 0
    # exponential-moving-average of the weights (0 = off, the reference
    # behaviour). When > 0 the trainer tracks ema = d*ema + (1-d)*params
    # each step and uses the averaged weights for validation, best-checkpoint
    # gating, and serving (utils/checkpoint.unwrap_trainer_params prefers
    # them); raw params remain the resume trajectory.
    ema_decay: float = 0.0
    # gradient accumulation: optimizer steps see an effective batch of
    # batch_size * grad_accum without the VMEM footprint of the big batch —
    # the B=128 single-shot step hits a memory cliff (338 ms/step,
    # results/round4_rams/batch_sweep_hi.json) that 2x64 accumulation
    # avoids. Weighted-sum accumulation makes k micro-batches EXACTLY one
    # big-batch step (ragged/padded samples included).
    grad_accum: int = 1
    checkpoint_dir: str = "ckpt"
    log_dir: str = "logs"
    max_to_keep: int = 3
    save_best_only: bool = True
    data_aug: bool = False
    tensorboard: bool = False  # also emit tfevents (training.py:128-129)
