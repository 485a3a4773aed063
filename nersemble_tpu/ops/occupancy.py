"""Binary occupancy grid with EMA updates.

TPU replacement for nerfacc's ``OccGridEstimator`` maintenance
(reference: nersemble_instant_ngp.py:133-137, 184-196; nerfacc
``update_every_n_steps``). The grid state is a single [G^3] f32 pytree leaf;
binaries are derived as ``occs > min(mean(occs), occ_thre)`` and optionally
ANDed with the precomputed camera-frustum-culling grid
(reference: nersemble_volumetric_sampler.py:28-42, 90-93).

Update semantics (every n=16 steps):
- warm-up (< 256 steps): evaluate every cell,
- after: half the probe budget uniform cells, half sampled from currently
  occupied cells (inverse-CDF over the binary mask),
- probe position jittered uniformly inside the cell, density evaluated at a
  random timestep per probe (the grid covers the union of occupancy over
  time), multiplied by render_step_size,
- EMA: ``occs[idx] = max(occs[idx] * decay, occ_new)``.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def occupancy_binaries(occs: jnp.ndarray, occ_thre: float,
                       frustum_grid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[L*G^3] EMA densities -> flat binary occupancy (threshold = min of the
    global mean and occ_thre, like nerfacc). The camera-frustum culling grid
    applies to the base (finest) level only — coarser cascade levels cover
    space outside every training frustum by construction."""
    thre = jnp.minimum(jnp.mean(occs), occ_thre)
    binaries = occs > thre
    if frustum_grid is not None:
        f = frustum_grid.reshape(-1)
        if f.shape[0] == binaries.shape[0]:
            binaries = binaries & f
        else:
            binaries = binaries.at[:f.shape[0]].set(binaries[:f.shape[0]] & f)
    return binaries


def cell_positions(cell_idx: jnp.ndarray, resolution: int,
                   aabb_min: jnp.ndarray, aabb_max: jnp.ndarray,
                   rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Flat cell indices -> world positions (jittered inside the cell).

    Indices beyond G^3 address coarser cascade levels (flat layout
    ``level * G^3 + cell``): level ``l`` covers the base AABB scaled by
    ``2**l`` about its center (see ops/sampling.level_aabb)."""
    g = resolution
    lvl = cell_idx // (g * g * g)
    cell = cell_idx % (g * g * g)
    k = cell % g
    j = (cell // g) % g
    i = cell // (g * g)
    coords = jnp.stack([i, j, k], axis=-1).astype(jnp.float32)
    if rng is not None:
        coords = coords + jax.random.uniform(rng, coords.shape)
    else:
        coords = coords + 0.5
    center = (aabb_min + aabb_max) * 0.5
    half = (aabb_max - aabb_min) * 0.5 * jnp.exp2(lvl.astype(jnp.float32))[:, None]
    return (center - half) + coords / g * (2.0 * half)


def _sample_occupied_cells(rng, binaries_flat: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sample n cell indices ~uniformly from the occupied set via inverse CDF.

    If no cell is occupied this degenerates to sampling cell 0 — harmless, the
    EMA max() keeps the grid consistent.
    """
    cdf = jnp.cumsum(binaries_flat.astype(jnp.float32))
    total = cdf[-1]
    u = jax.random.uniform(rng, (n,)) * jnp.maximum(total, 1.0)
    return jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, cdf.shape[0] - 1)


def update_occupancy_grid(occs: jnp.ndarray,
                          occ_eval_fn: Callable,
                          rng: jax.Array,
                          resolution: int,
                          aabb_min: jnp.ndarray,
                          aabb_max: jnp.ndarray,
                          occ_thre: float,
                          ema_decay: float,
                          warmup: bool,
                          n_probe_cells: Optional[int] = None) -> jnp.ndarray:
    """One EMA update of the [G^3] grid.

    occ_eval_fn(positions [M, 3], rng) -> occ values [M] (density *
    render_step_size, evaluated at random timesteps by the caller's closure).
    ``warmup`` selects the all-cells variant (compile once per variant).
    """
    n_cells = occs.shape[0]
    pos_rng, time_rng, uni_rng, occ_rng = jax.random.split(rng, 4)

    if warmup:
        idx = jnp.arange(n_cells, dtype=jnp.int32)
    else:
        m = n_probe_cells or n_cells // 4
        uniform_idx = jax.random.randint(uni_rng, (m,), 0, n_cells, jnp.int32)
        binaries = occupancy_binaries(occs, occ_thre).reshape(-1)
        occupied_idx = _sample_occupied_cells(occ_rng, binaries, m).astype(jnp.int32)
        idx = jnp.concatenate([uniform_idx, occupied_idx])

    positions = cell_positions(idx, resolution, aabb_min, aabb_max, pos_rng)
    occ_new = occ_eval_fn(positions, time_rng)
    return occs.at[idx].set(jnp.maximum(occs[idx] * ema_decay, occ_new))


def frustum_culling_grid(camera_frustums, resolution: int,
                         aabb_min: np.ndarray, aabb_max: np.ndarray,
                         min_cameras: int) -> np.ndarray:
    """Host-side precompute: [G, G, G] bool, True where a voxel center is inside
    at least ``min_cameras`` training-camera view frustums
    (reference: nersemble_volumetric_sampler.py:28-42; note the reference uses
    linspace over cell corners — we match that convention)."""
    g = resolution
    xs = np.linspace(aabb_min[0], aabb_max[0], g)
    ys = np.linspace(aabb_min[1], aabb_max[1], g)
    zs = np.linspace(aabb_min[2], aabb_max[2], g)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    points = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    count = np.zeros(points.shape[0], dtype=np.int32)
    for frustum in camera_frustums:
        count += frustum.contains_points(points).astype(np.int32)
    return (count >= min_cameras).reshape(g, g, g)
