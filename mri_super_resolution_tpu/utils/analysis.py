"""Experiment-CSV analysis and visualisation.

Reference equivalents:
- ``analyze_results.ipynb`` (cells 2-8): pandas aggregation of the contrast /
  CNR CSVs and seaborn barplots per metric x image-type across patients.
- ``observe_epochs.m``: MATLAB animation of the reconstruction across training
  epochs against the mean image — here a PNG filmstrip / GIF writer over the
  snapshot stack that ``cli/automate_inr.py`` saves.
"""
from __future__ import annotations

import os

import numpy as np


def load_contrast_csv(path: str):
    """Load a master.py-schema CSV into a tidy DataFrame."""
    import pandas as pd

    return pd.read_csv(path)


def summarize_contrast(df, metric: str = "CNR"):
    """Mean +- std of a metric per image type (analyze_results cells 3-5)."""
    sub = df[df["metric"] == metric]
    return sub.groupby("image")["performance"].agg(["mean", "std", "count"])


def barplot_metric(df, metric: str, out_path: str, direction: str | None = None):
    """Seaborn barplot of metric by image type across patients."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    sub = df[df["metric"] == metric]
    if direction is not None:
        sub = sub[sub["direction"] == direction]
    fig, ax = plt.subplots(figsize=(10, 5))
    sns.barplot(data=sub, x="image", y="performance", errorbar="sd", ax=ax)
    ax.set_title(f"{metric}" + (f" ({direction})" if direction else ""))
    ax.tick_params(axis="x", rotation=30)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def epoch_filmstrip(
    snapshots: np.ndarray,  # (H, W, T) reconstruction snapshots
    mean_image: np.ndarray,
    out_path: str,
    max_frames: int = 12,
):
    """observe_epochs.m equivalent: reconstruction evolution vs the mean."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = snapshots.shape[-1]
    idx = np.linspace(0, T - 1, min(max_frames, T)).astype(int)
    cols = len(idx) + 1
    fig, axes = plt.subplots(1, cols, figsize=(3 * cols, 3))
    for a, t in zip(axes[:-1], idx):
        a.imshow(snapshots[:, :, t], cmap="gray")
        a.set_title(f"epoch snap {t}")
        a.axis("off")
    axes[-1].imshow(mean_image, cmap="gray")
    axes[-1].set_title("mean image")
    axes[-1].axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def epoch_gif(snapshots: np.ndarray, out_path: str, fps: int = 4):
    """Animated GIF of the epoch evolution (observe_epochs.m's movie)."""
    from matplotlib import animation
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    im = ax.imshow(snapshots[:, :, 0], cmap="gray")
    ax.axis("off")

    def update(t):
        im.set_data(snapshots[:, :, t])
        ax.set_title(f"snapshot {t}")
        return [im]

    anim = animation.FuncAnimation(fig, update, frames=snapshots.shape[-1])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path
