"""Multiresolution dense-grid INR — a fast-converging alternative to FF-SIREN.

Technique (public literature; see PAPERS.md): "Instant Neural Graphics
Primitives" (Mueller et al. 2022) replaces frequency encodings with learned
multiresolution feature grids + a tiny MLP, converging orders of magnitude
faster on fitting tasks. At DWI volume sizes the hash table is unnecessary —
dense grids fit comfortably in HBM — and dense grids are the TPU-friendly
variant anyway (gathers over small dense tables, no hash collisions, static
shapes).

Design for the (x, y, z, b) DWI domain:
- L resolution levels of dense 3-D feature grids over (x, y, z), resolution
  growing geometrically; F features per level, trilinearly interpolated;
- the b axis is categorical (4 values): a per-b learned embedding is
  concatenated (diffusion decay is smooth in b but only 4 samples exist —
  an embedding is strictly more expressive than interpolating a 4-point axis);
- a small ReLU MLP head maps concatenated level features -> intensity.

This is an *addition* to the reference's model zoo (SIREN/WIRE/FF are all
implemented for parity); use it where wall-clock-to-quality matters.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _trilinear_gather(grid: Array, coords01: Array) -> Array:
    """Trilinearly interpolate a dense (R1, R2, R3, F) grid at (N, 3) coords
    in [0, 1]^3."""
    R = jnp.asarray(grid.shape[:3], dtype=coords01.dtype)
    pos = coords01 * (R - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    lo = jnp.clip(lo, 0, jnp.asarray(grid.shape[:3]) - 2)
    frac = pos - lo.astype(coords01.dtype)

    def corner(dx, dy, dz):
        idx = lo + jnp.asarray([dx, dy, dz])
        w = (
            (frac[:, 0] if dx else 1 - frac[:, 0])
            * (frac[:, 1] if dy else 1 - frac[:, 1])
            * (frac[:, 2] if dz else 1 - frac[:, 2])
        )
        vals = grid[idx[:, 0], idx[:, 1], idx[:, 2]]
        return w[:, None] * vals

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                out = out + corner(dx, dy, dz)
    return out


class GridINR(nn.Module):
    """Multires dense-grid INR over [-1, 1]^3 x {0..num_b-1}.

    Call with (N, 4) coords whose first 3 dims are continuous in [-1, 1] and
    whose 4th is the (continuous, as produced by mgrid) b-axis coordinate —
    it is snapped to the nearest of ``num_b`` embedding slots.
    """

    num_levels: int = 4
    base_resolution: int = 8
    growth: float = 2.0
    features_per_level: int = 4
    num_b: int = 4
    b_features: int = 8
    hidden: int = 64
    out_features: int = 1
    # z-axis grid resolution = max(R // z_divisor, 2). The default 4 suits
    # full volumes (z slices ~4x sparser than in-plane, e.g. 128x128x28);
    # ROI-cropped fits where z is comparable to (or larger than) the in-plane
    # extent — superres3d's 25x25x28 LR grid — need z_divisor=1 or the slice
    # axis is under-resolved at every level.
    z_divisor: int = 4

    @nn.compact
    def __call__(self, coords: Array) -> Array:
        xyz01 = jnp.clip((coords[:, :3] + 1.0) * 0.5, 0.0, 1.0)
        # b coordinate in [-1, 1] -> slot index
        b_idx = jnp.round((coords[:, 3] + 1.0) * 0.5 * (self.num_b - 1)).astype(jnp.int32)
        b_idx = jnp.clip(b_idx, 0, self.num_b - 1)

        feats = []
        for l in range(self.num_levels):
            R = int(round(self.base_resolution * self.growth**l))
            grid = self.param(
                f"grid_{l}",
                nn.initializers.uniform(scale=1e-4),
                (R, R, max(R // self.z_divisor, 2), self.features_per_level),
            )
            feats.append(_trilinear_gather(grid, xyz01))
        b_emb = self.param(
            "b_embedding", nn.initializers.normal(1e-2), (self.num_b, self.b_features)
        )
        feats.append(b_emb[b_idx])

        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        return nn.Dense(self.out_features)(h)


# ---------------------------------------------------------------------------
# Tensor-product (separable) evaluation — the TPU-fast path
# ---------------------------------------------------------------------------
#
# Round-1 measurement: GridINR through per-point gathers took 66 s to 40 dB
# vs 6 s for FF-SIREN — the gathers (and the scatter-adds in their backward)
# are TPU-hostile at this scale. But every fit/inference grid in these
# pipelines is ``mgrid(shape)`` — a tensor-product grid — and trilinear
# interpolation is SEPARABLE on such grids: with per-axis interpolation
# matrices Ax (nx, Rx), Ay, Az (each row two nonzeros), level features for
# the whole grid are three small dense contractions
#     (Ax x Ay x Az) grid  ==  einsum chains of plain matmuls,
# and the backward is the transposed contractions — scatter-free, all MXU.


def _axis_weights(n: int, R: int, dtype=jnp.float32) -> Array:
    """(n, R) linear-interpolation matrix from R grid knots to n uniform
    samples of [0, 1], with the same floor/clip convention as
    :func:`_trilinear_gather` (so tensor and pointwise paths agree exactly)."""
    pos = jnp.linspace(0.0, 1.0, n, dtype=dtype) * (R - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 2)
    frac = pos - lo.astype(dtype)
    return (
        jax.nn.one_hot(lo, R, dtype=dtype) * (1.0 - frac)[:, None]
        + jax.nn.one_hot(lo + 1, R, dtype=dtype) * frac[:, None]
    )


def _mlp_head(p: dict, h: Array) -> Array:
    h = jax.nn.relu(h @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"])
    h = jax.nn.relu(h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"])
    return h @ p["Dense_2"]["kernel"] + p["Dense_2"]["bias"]


def _tensor_apply_with_z(model: "GridINR", p, nx: int, ny: int,
                         Az_list, nz: int, nb: int) -> Array:
    """Separable forward with per-level z-interpolation matrices supplied by
    the caller (static for :func:`grid_inr_tensor_apply`, traced for the
    z-bucketed fit path). Returns (nx*ny*nz*nb, out)."""
    feats = []
    for l in range(model.num_levels):
        g = p[f"grid_{l}"]  # (Rx, Ry, Rz, F)
        Rx, Ry, _, _ = g.shape
        Ax = _axis_weights(nx, Rx, g.dtype)
        Ay = _axis_weights(ny, Ry, g.dtype)
        Az = Az_list[l]  # (nz, Rz)
        t = jnp.einsum("xa,abcf->xbcf", Ax, g)
        t = jnp.einsum("yb,xbcf->xycf", Ay, t)
        t = jnp.einsum("zc,xycf->xyzf", Az, t)
        feats.append(t)

    xyz = jnp.concatenate(feats, axis=-1)  # (nx, ny, nz, L*F)
    # b axis: nb mgrid points in [-1, 1] snap to embedding slots
    b_pos = jnp.clip(
        jnp.round(jnp.linspace(0.0, 1.0, nb) * (model.num_b - 1)).astype(jnp.int32),
        0,
        model.num_b - 1,
    )
    b_feat = p["b_embedding"][b_pos]  # (nb, bF) — an nb-row gather, negligible

    lf = xyz.shape[-1]
    h = jnp.concatenate(
        [
            jnp.broadcast_to(xyz[:, :, :, None, :], (nx, ny, nz, nb, lf)),
            jnp.broadcast_to(b_feat[None, None, None], (nx, ny, nz, nb, b_feat.shape[-1])),
        ],
        axis=-1,
    ).reshape(nx * ny * nz * nb, lf + b_feat.shape[-1])
    return _mlp_head(p, h)


def grid_inr_tensor_apply(model: "GridINR", params, shape: tuple) -> Array:
    """Evaluate a GridINR on the full ``mgrid(shape)`` grid separably.

    Drop-in replacement for ``model.apply(params, mgrid(shape))`` whenever
    the coordinates are the tensor-product grid itself (every fit and
    dense-inference call in the pipelines). Returns (prod(shape), out).
    """
    nx, ny, nz, nb = shape
    p = params["params"]
    Az_list = []
    for l in range(model.num_levels):
        Rz = p[f"grid_{l}"].shape[2]
        Az_list.append(_axis_weights(nz, Rz, p[f"grid_{l}"].dtype))
    return _tensor_apply_with_z(model, p, nx, ny, Az_list, nz, nb)


@functools.lru_cache(maxsize=64)
def make_tensor_apply(model: "GridINR", shape: tuple):
    """apply(params, coords)-shaped adapter for the fit engine: ignores the
    coords argument's values (they ARE mgrid(shape)) and evaluates separably.

    lru_cached by (model-config, shape) value so callers that pass it as a
    static jit argument (fit_alternating_pn) share one executable across
    patients with equal configs."""

    def apply(params, coords):
        return grid_inr_tensor_apply(model, params, shape)

    return apply


@functools.lru_cache(maxsize=64)
def make_tensor_value_and_grad(model: "GridINR", shape: tuple):
    """Identity-stable ``(params, coords, target) -> (loss, grads)`` for the
    fit engine's ``inr_value_and_grad`` hook: MSE through the separable
    tensor-product forward (coords are ignored — they ARE mgrid(shape))."""
    apply = make_tensor_apply(model, shape)

    def vag(params, coords, target):
        def loss_fn(p):
            pred = apply(p, coords)
            return jnp.mean((pred - target) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    return vag


# --------------------------------------------------------------------------
# z-bucketed fit path — one executable per slice-count BUCKET
# --------------------------------------------------------------------------
#
# The tensor fit program above is shape-specialized: a cohort patient with a
# novel slice count S pays a fresh 15-30 s compile of the whole scanned fit.
# The in-plane ROI sides (nx, ny) and b count are cohort-constant; only S
# varies. So: pad the z axis to the next power-of-two bucket, ship the
# per-level z-interpolation matrices (rows beyond S zeroed) PLUS a z validity
# mask as ONE runtime array, and compute a masked MSE whose normalizer is the
# true voxel count. Padded rows contribute exactly zero loss and zero
# gradient (their Az rows are zero AND the mask zeroes their residuals), so
# the fit is bit-equivalent in expectation to the unbucketed program while
# every S in a bucket shares one executable.


def _level_z_res(model: "GridINR") -> list[int]:
    """Per-level z grid resolutions, matching GridINR.__call__'s params."""
    out = []
    for l in range(model.num_levels):
        R = int(round(model.base_resolution * model.growth**l))
        out.append(max(R // model.z_divisor, 2))
    return out


def z_bucket_for(nz: int) -> int:
    """Power-of-two bucket for a slice count (min 4).

    Trade-off (deliberate): a volume with nz just above a boundary (e.g. 33
    slices -> bucket 64) pays up to ~2x the z compute on every step and
    inference forever, in exchange for a bounded executable population
    (one compile per power of two). The cohorts seen so far are nz<=32
    (<=2% padding waste at 31-32 slices), so the pow2 scheme stands; if
    large-nz cohorts appear, coarsen to round-up-to-multiple-of-8 and eat
    the extra compiles (ADVICE r4)."""
    return max(4, 1 << (int(nz) - 1).bit_length())


def build_z_aux(model: "GridINR", nz: int, z_bucket: int | None = None) -> Array:
    """(z_bucket, sum(Rz_l) + 1) runtime aux: per-level z-interpolation
    matrices for ``nz`` true slices padded with zero rows, then a validity
    mask column (1 for the first ``nz`` rows).

    Built HOST-side (numpy) in one device_put: the eager jnp version
    dispatched ~10 tiny per-(nz, Rz) programs per novel slice count — each a
    1-2 s compile through a tunnelled backend — which defeated the point of
    bucketing (measured 15-17 s of 'setup' per novel S)."""
    import numpy as _np

    if z_bucket is None:
        z_bucket = z_bucket_for(nz)
    assert z_bucket >= nz
    cols = []
    for Rz in _level_z_res(model):
        pos = _np.linspace(0.0, 1.0, nz, dtype=_np.float32) * (Rz - 1)
        lo = _np.clip(_np.floor(pos).astype(_np.int32), 0, Rz - 2)
        frac = (pos - lo).astype(_np.float32)
        Az = _np.zeros((z_bucket, Rz), _np.float32)
        Az[_np.arange(nz), lo] = 1.0 - frac
        Az[_np.arange(nz), lo + 1] += frac
        cols.append(Az)
    mask = _np.zeros((z_bucket, 1), _np.float32)
    mask[:nz, 0] = 1.0
    return jnp.asarray(_np.concatenate(cols + [mask], axis=1))


@functools.lru_cache(maxsize=64)
def make_zbucket_value_and_grad(model: "GridINR", nx: int, ny: int,
                                z_bucket: int, nb: int):
    """Identity-stable ``(params, z_aux, target_padded) -> (loss, grads)``
    keyed on (model-config, nx, ny, z_bucket, nb) — NOT on the true slice
    count. ``z_aux`` is :func:`build_z_aux`'s array; ``target_padded`` is the
    (nx*ny*z_bucket*nb, 1) target with arbitrary values in padded-z rows
    (they are masked out). The loss equals the unbucketed
    ``mean((pred - target)**2)`` over the true voxels exactly.

    Signature-compatible with the fit engine's ``value_and_grad_fn`` /
    ``inr_value_and_grad`` hooks (z_aux rides the coords slot, like the
    SIREN kernel's ``padded_ff``)."""
    def vag(params, z_aux, target):
        def loss_fn(prm):
            p = prm["params"]
            Az_list, mask = _split_z_aux(model, z_aux)
            pred = _tensor_apply_with_z(model, p, nx, ny, Az_list, z_bucket, nb)
            r2 = (pred - target) ** 2
            w = jnp.broadcast_to(
                mask[None, None, :, None, None], (nx, ny, z_bucket, nb, 1)
            ).reshape(-1, 1)
            return jnp.sum(r2 * w) / (nx * ny * nb * jnp.sum(mask))

        return jax.value_and_grad(loss_fn)(params)

    return vag


def pad_target_z(target, shape: tuple, z_bucket: int) -> Array:
    """Pad a flattened (prod(shape), 1) mgrid-ordered target along the z axis
    to ``z_bucket`` planes (zeros; masked out by the z-bucketed loss).

    Host-side (numpy) for the same reason as :func:`build_z_aux` — the pad
    is per-novel-shape work that must not cost tiny-op compiles. Accepts a
    numpy or device array (device arrays round-trip through the host, which
    is fine: this runs once per patient in prep, not in the fit loop)."""
    import numpy as _np

    nx, ny, nz, nb = shape
    t = _np.asarray(target)
    t = t.reshape(nx, ny, nz, nb, -1)
    t = _np.pad(t, ((0, 0), (0, 0), (0, z_bucket - nz), (0, 0), (0, 0)))
    return jnp.asarray(t.reshape(nx * ny * z_bucket * nb, -1))


def _split_z_aux(model: "GridINR", z_aux: Array) -> tuple[list, Array]:
    """z_aux columns -> (per-level Az list, z validity mask)."""
    res = _level_z_res(model)
    offs = [0]
    for R in res:
        offs.append(offs[-1] + R)
    return ([z_aux[:, offs[l]:offs[l + 1]] for l in range(len(res))],
            z_aux[:, -1])


@functools.lru_cache(maxsize=64)
def _tensor_runner_zbucket(model: "GridINR", nx: int, ny: int,
                           z_bucket: int, nb: int, clamp_min):
    """Identity-stable jitted tensor evaluator with the z axis bucketed:
    ONE executable per (model-config, nx, ny, z_bucket, nb, clamp) serves
    every slice count in the bucket (the inference analog of
    :func:`make_zbucket_value_and_grad`)."""

    @jax.jit
    def run(params, z_aux):
        Az_list, _ = _split_z_aux(model, z_aux)
        out = _tensor_apply_with_z(model, params["params"], nx, ny,
                                   Az_list, z_bucket, nb)
        if clamp_min is not None:
            out = jnp.clip(out, clamp_min, None)
        return out.reshape(nx, ny, z_bucket, nb, -1)

    return run


def infer_tensor_grid_zbucket(model: "GridINR", params, shape: tuple,
                              clamp_min=None) -> np.ndarray:
    """Dense tensor-grid inference on ``mgrid(shape)`` through the z-bucketed
    program — novel slice counts within a bucket pay ZERO compiles (the
    shape-keyed :func:`infer_tensor_grid` paid 4-15 s per novel S on a
    tunnelled backend). Returns a host (prod(shape), out) array."""
    nx, ny, nz, nb = (int(s) for s in shape)
    zb = z_bucket_for(nz)
    z_aux = build_z_aux(model, nz, zb)
    out = _tensor_runner_zbucket(model, nx, ny, zb, nb, clamp_min)(
        params, z_aux)
    return np.asarray(out)[:, :, :nz].reshape(nx * ny * nz * nb, -1)


@functools.lru_cache(maxsize=64)
def _tensor_runner(model: "GridINR", shape: tuple, clamp_min):
    """Identity-stable jitted tensor-product grid evaluator (params traced;
    one executable per (model-config, shape, clamp) — flax Modules are frozen
    dataclasses, so equal configs share cache entries across patients)."""

    @jax.jit
    def run(params):
        out = grid_inr_tensor_apply(model, params, shape)
        return jnp.clip(out, clamp_min, None) if clamp_min is not None else out

    return run


def infer_tensor_grid(
    model: "GridINR", params, shape: tuple, clamp_min=None
) -> Array:
    """Dense-grid inference on ``mgrid(shape)`` via the separable path — the
    GridINR analog of fit/engine.infer_dense_grid (no chunking needed: the
    contractions never materialise a (P, d) coordinate array)."""
    return _tensor_runner(model, tuple(int(s) for s in shape), clamp_min)(params)


class GridINR2D(nn.Module):
    """2-D variant for slice fitting (bilinear grids, no b axis)."""

    num_levels: int = 4
    base_resolution: int = 8
    growth: float = 2.0
    features_per_level: int = 4
    hidden: int = 64
    out_features: int = 1

    @nn.compact
    def __call__(self, coords: Array) -> Array:
        xy01 = jnp.clip((coords + 1.0) * 0.5, 0.0, 1.0)
        feats = []
        for l in range(self.num_levels):
            R = int(round(self.base_resolution * self.growth**l))
            grid = self.param(
                f"grid_{l}",
                nn.initializers.uniform(scale=1e-4),
                (R, R, self.features_per_level),
            )
            # bilinear via the trilinear helper with a duplicated z plane
            # (z resolution must be >= 2 for the corner clipping)
            g3 = jnp.concatenate([grid[:, :, None, :]] * 2, axis=2)
            c3 = jnp.concatenate([xy01, jnp.zeros_like(xy01[:, :1])], axis=-1)
            feats.append(_trilinear_gather(g3, c3))
        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        return nn.Dense(self.out_features)(h)
