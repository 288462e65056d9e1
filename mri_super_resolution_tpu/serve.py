"""Serving: serialized, self-contained inference artifacts via ``jax.export``.

The reference has no deployment story: serving a fitted INR means shipping
the full source tree plus a ``torch.save`` state_dict and re-instantiating
the module in-process (implicit-neural-representations/INR_ERD.py:219-220,
inr_toy.py:114-115), and the MISR side restores a TF checkpoint into
freshly-built Keras code (multi-image-super-resolution/master.py:30-35).
Either way the consumer needs the exact model code and framework version.

The TPU-native equivalent is :func:`jax.export.export`: trace the inference
function ONCE (fitted params baked in as constants), serialize the StableHLO
module to bytes, and run it later from any process — no model code, no flax,
no re-trace — on whichever platforms it was lowered for. StableHLO carries
jax.export's compatibility window (exported artifacts keep loading on newer
JAX releases), which makes these artifacts durable deployment objects rather
than pickles.

Artifacts are directories::

    <out>/
      module.jaxexport   # serialized Exported (StableHLO + calling conv)
      manifest.json      # kind, input spec, platforms, jax version

The batch dimension is exported SYMBOLICALLY, so one artifact serves any
number of coordinates / any inference batch: an INR artifact maps
``(n, d) float32`` coords to ``(n, out) float32`` for every ``n``, and a
RAMS artifact maps ``(b, H, W, T) float32`` to ``(b, sH, sW, 1)`` for every
``b`` (H, W are fixed at export; convolution padding shapes are static).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .core.coords import fourier_encode

_MODULE_FILE = "module.jaxexport"
_MANIFEST_FILE = "manifest.json"


def _default_platforms() -> tuple[str, ...]:
    plat = jax.default_backend()
    return (plat,) if plat == "cpu" else (plat, "cpu")


def export_fn(
    fn: Callable,
    args_spec: Sequence[jax.ShapeDtypeStruct],
    out_dir: str,
    *,
    kind: str,
    platforms: Sequence[str] | None = None,
    extra_manifest: dict | None = None,
) -> dict:
    """Export ``fn`` at ``args_spec`` and write the artifact directory.

    Returns the manifest dict. ``fn`` must be jittable; any fitted
    parameters should be closed over (they are baked into the module as
    constants, making the artifact self-contained).
    """
    platforms = tuple(platforms) if platforms else _default_platforms()
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*args_spec)
    blob = exported.serialize()

    manifest = {
        "kind": kind,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "in_avals": [
            {"shape": [str(d) for d in s.shape], "dtype": str(s.dtype)}
            for s in args_spec
        ],
        "out_avals": [
            {"shape": [str(d) for d in a.shape], "dtype": str(a.dtype)}
            for a in exported.out_avals
        ],
    }
    if extra_manifest:
        manifest.update(extra_manifest)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MODULE_FILE), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, _MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def export_inr(
    apply_fn: Callable,
    params: Any,
    coord_dim: int,
    out_dir: str,
    *,
    fourier_B: jax.Array | None = None,
    out_features: int = 1,
    platforms: Sequence[str] | None = None,
    model_desc: str = "",
    extra_manifest: dict | None = None,
) -> dict:
    """Export a fitted coordinate-INR as ``coords (n, d) -> (n, out)``.

    ``fourier_B`` (if the fit used Fourier features) is baked in alongside
    the params, so the artifact consumes RAW coordinates — the consumer
    does not need to know the encoding. The batch dim ``n`` is symbolic.
    """
    B = None if fourier_B is None else jnp.asarray(fourier_B)

    def infer(coords):
        return apply_fn(params, fourier_encode(coords, B))

    (n,) = jax_export.symbolic_shape("n")
    spec = jax.ShapeDtypeStruct((n, coord_dim), jnp.float32)
    manifest = {
        "coord_dim": coord_dim,
        "out_features": out_features,
        "fourier_features": None if B is None else list(B.shape),
        "model": model_desc,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    return export_fn(
        infer,
        [spec],
        out_dir,
        kind="inr",
        platforms=platforms,
        extra_manifest=manifest,
    )


def export_rams(
    apply_fn: Callable,
    params: Any,
    out_dir: str,
    *,
    height: int,
    width: int,
    channels: int = 9,
    scale: int = 3,
    platforms: Sequence[str] | None = None,
    model_desc: str = "",
) -> dict:
    """Export a trained RAMS as ``(b, H, W, T) -> (b, sH, sW, 1)``.

    H/W are static (conv padding and depth_to_space shapes bake in); the
    inference batch ``b`` is symbolic so one artifact serves the reference's
    25-draw ensemble (multi-image-super-resolution/master.py:45-52) or any
    other batching in one call.
    """

    def infer(x):
        return apply_fn(params, x)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, height, width, channels), jnp.float32)
    return export_fn(
        infer,
        [spec],
        out_dir,
        kind="rams",
        platforms=platforms,
        extra_manifest={
            "height": height,
            "width": width,
            "channels": channels,
            "scale": scale,
            "model": model_desc,
        },
    )


def export_pia(
    encode_fn: Callable,
    params: Any,
    out_dir: str,
    *,
    number_of_signals: int = 16,
    platforms: Sequence[str] | None = None,
    model_desc: str = "",
    extra_manifest: dict | None = None,
) -> dict:
    """Export a trained PIA encoder as ``signals (n, S) -> (D, T2, v)``.

    The amortized tissue fitter (models/pia.py, reference PIA.py:16-155) as
    a serving artifact: raw multi-b/multi-TE signal vectors in, the three
    (n, 3) compartment parameter maps out — the deployment form of
    ``superres_hybrid --tissue_fit pia``. ``encode_fn(params, signals)``
    must return the ``(D, T2, v)`` tuple (e.g.
    ``lambda p, x: model.apply(p, x, method=PIA.encode)``). The voxel batch
    ``n`` is symbolic; the encoder's input scaling and the tanh/softmax
    priors are baked into the module.
    """

    def infer(signals):
        return encode_fn(params, signals)

    (n,) = jax_export.symbolic_shape("n")
    spec = jax.ShapeDtypeStruct((n, number_of_signals), jnp.float32)
    manifest = {
        "number_of_signals": number_of_signals,
        "outputs": ["D (n,3)", "T2 (n,3)", "v (n,3)"],
        "model": model_desc,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    return export_fn(
        infer,
        [spec],
        out_dir,
        kind="pia",
        platforms=platforms,
        extra_manifest=manifest,
    )


def export_grid_inr(
    model: Any,
    params: Any,
    out_dir: str,
    *,
    nb: int | None = None,
    clamp_min: float | None = 0.0,
    platforms: Sequence[str] | None = None,
    model_desc: str = "",
    extra_manifest: dict | None = None,
) -> dict:
    """Export a fitted GridINR as ``(x, y, z) axis coordinates ->
    (nx, ny, nz, nb, out)`` via the separable tensor-product path.

    ALL THREE spatial axes are symbolic: the consumer passes per-axis
    coordinate vectors in [-1, 1] (each any length, any spacing — mgrid
    planes of any density, the 2x in-plane SR grid, arbitrary continuous
    z supersampling), and the module builds the per-axis interpolation
    matrices in-graph. One artifact therefore serves the LR grid, the HR
    grid, AND the 2x recon grid of the 3-D pipeline — every density, zero
    recompiles, zero padding waste. This is the serving analog of the fit
    path's z-bucketing (models/grid_inr.py), strictly better here because
    export fixes the executable once; it is only possible because the
    evaluation is separable (per-point INRs like SIREN/WIRE export with a
    flat symbolic coord batch instead, :func:`export_inr`).

    This is the dense-grid inference of the reference's 3-D pipeline
    (superresDWI.py:161-162) as a deployment object — the ``quality``
    preset's model becomes servable without this repo's code.
    """
    from .models.grid_inr import _level_z_res, _mlp_head

    nb = int(nb if nb is not None else model.num_b)
    p = jax.tree_util.tree_map(jnp.asarray, params["params"])
    z_res = _level_z_res(model)

    def _axis_mat(c, R):
        """(n, R) linear-interp matrix from [-1,1] coords, same floor/clip
        convention as grid_inr._axis_weights."""
        c01 = jnp.clip((c + 1.0) * 0.5, 0.0, 1.0)
        pos = c01 * (R - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 2)
        frac = (pos - lo).astype(c01.dtype)
        return (
            jax.nn.one_hot(lo, R, dtype=c01.dtype) * (1.0 - frac)[:, None]
            + jax.nn.one_hot(lo + 1, R, dtype=c01.dtype) * frac[:, None]
        )

    def infer(x_coords, y_coords, z_coords):
        nx, ny, nz = x_coords.shape[0], y_coords.shape[0], z_coords.shape[0]
        feats = []
        for l in range(model.num_levels):
            g = p[f"grid_{l}"]  # (Rx, Ry, Rz, F)
            t = jnp.einsum("xa,abcf->xbcf", _axis_mat(x_coords, g.shape[0]), g)
            t = jnp.einsum("yb,xbcf->xycf", _axis_mat(y_coords, g.shape[1]), t)
            t = jnp.einsum("zc,xycf->xyzf", _axis_mat(z_coords, z_res[l]), t)
            feats.append(t)
        xyz = jnp.concatenate(feats, axis=-1)  # (nx, ny, nz, L*F)
        b_pos = jnp.clip(
            jnp.round(jnp.linspace(0.0, 1.0, nb)
                      * (model.num_b - 1)).astype(jnp.int32),
            0, model.num_b - 1)
        b_feat = p["b_embedding"][b_pos]  # (nb, bF)
        lf = xyz.shape[-1]
        h = jnp.concatenate(
            [
                jnp.broadcast_to(xyz[:, :, :, None, :], (nx, ny, nz, nb, lf)),
                jnp.broadcast_to(b_feat[None, None, None],
                                 (nx, ny, nz, nb, b_feat.shape[-1])),
            ],
            axis=-1,
        ).reshape(nx * ny * nz * nb, lf + b_feat.shape[-1])
        out = _mlp_head(p, h)
        if clamp_min is not None:
            out = jnp.clip(out, clamp_min, None)
        return out.reshape(nx, ny, nz, nb, -1)

    nx, ny, nz = jax_export.symbolic_shape("nx, ny, nz")
    specs = [jax.ShapeDtypeStruct((d,), jnp.float32) for d in (nx, ny, nz)]
    manifest = {
        "nb": nb,
        "clamp_min": clamp_min,
        "input": "three axis-coordinate vectors (nx,), (ny,), (nz,) in "
                 "[-1, 1]; all lengths symbolic",
        "model": model_desc,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    return export_fn(
        infer,
        specs,
        out_dir,
        kind="grid_inr",
        platforms=platforms,
        extra_manifest=manifest,
    )


@dataclass
class Served:
    """A loaded artifact: ``call`` runs the deserialized module under jit."""

    manifest: dict
    exported: Any

    def __post_init__(self):
        self._jitted = jax.jit(self.exported.call)

    def __call__(self, *args):
        return self._jitted(*args)


def load(path: str) -> Served:
    """Load an artifact directory written by :func:`export_fn`."""
    with open(os.path.join(path, _MODULE_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(path, _MANIFEST_FILE)) as f:
        manifest = json.load(f)
    return Served(manifest=manifest, exported=exported)
