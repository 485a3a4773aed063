"""Occupancy-grid ray marching with fixed shapes.

TPU redesign of nerfacc's ``OccGridEstimator.sampling`` CUDA DDA traversal
(reference: nersemble_volumetric_sampler.py:95-108). XLA needs static shapes,
so instead of emitting a variable-length packed sample list we:

1. intersect each ray with the scene AABB (slab method),
2. march ``n_candidates`` uniform steps of ``render_step_size`` from the entry
   point (stratified per-ray jitter during training, like nerfacc's
   ``stratified=True``),
3. mark candidates whose cell is occupied in the binary grid,
4. compact occupied candidates to the front of ``max_samples_per_ray`` slots
   per ray with a stable sort on the validity mask (ascending t preserved).

The field then only evaluates the compacted [R, S_max] samples — the
fixed-shape analogue of nerfacc skipping empty space. Candidates beyond
``S_max`` per ray are dropped from the far end (transmittance there is
typically negligible); the wasted-lane fraction and overflow count are
reported as diagnostics.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RaySamples(NamedTuple):
    """Fixed-shape per-ray samples: all [R, S] (mask marks valid slots)."""

    t_starts: jnp.ndarray
    t_ends: jnp.ndarray
    mask: jnp.ndarray

    def positions(self, origins, directions, offsets=None):
        """World-space midpoints [R, S, 3] (+ optional warp offsets)."""
        mids = (self.t_starts + self.t_ends) * 0.5
        pos = origins[:, None, :] + directions[:, None, :] * mids[..., None]
        if offsets is not None:
            pos = pos + offsets
        return pos


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, perm: jnp.ndarray,
                 inv_perm: jnp.ndarray) -> jnp.ndarray:
    """``x[perm]`` for a TRUE permutation, with a gather-only backward.

    The transpose of a permutation gather is a permutation scatter — which
    equals a gather by the inverse permutation. XLA does not know ``perm``
    is bijective and would emit its slow scalar scatter (~5 M rows/s on v5e
    for narrow rows); providing ``inv_perm`` keeps both directions on the
    ~10x faster gather path. Caller must guarantee ``perm[inv_perm] == iota``.
    """
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), (perm, inv_perm)


def _permute_rows_bwd(res, g):
    perm, inv_perm = res
    return jnp.take(g, inv_perm, axis=0), None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_rows_back(x: jnp.ndarray, sel: jnp.ndarray,
                      n_total: int) -> jnp.ndarray:
    """Route ``x [budget, W]`` to rows ``sel`` of a zero [n_total, W] buffer.

    The inverse of selecting rows ``sel``: equivalent to
    ``permute_rows(pad(x), inv, order)`` but costs ``budget`` scattered rows
    instead of ``n_total`` gathered rows — the winning formulation when the
    compaction budget is a small fraction of R*S (the eval path: an
    auto-probed 8k budget against a 4.2M-slot chunk made the route-back
    gather the single largest op of the small-frame render step, 187
    ms/frame, during the round-3 fast-path work — PERF.md render table;
    the recorded reference-scale number is RENDER_r04.json). ``sel`` must
    be duplicate-free (compaction
    ranks are). Backward is a ``budget``-row gather.
    """
    return jnp.zeros((n_total, x.shape[1]), x.dtype).at[sel].set(x)


def _scatter_rows_back_fwd(x, sel, n_total):
    return scatter_rows_back(x, sel, n_total), sel


def _scatter_rows_back_bwd(n_total, sel, g):
    return jnp.take(g, sel, axis=0), None


scatter_rows_back.defvjp(_scatter_rows_back_fwd, _scatter_rows_back_bwd)


def compact_samples(mask: jnp.ndarray, budget: int):
    """Global sample compaction: pick the ``budget`` valid (ray, slot) pairs
    to evaluate, slot-major so the far tail is dropped uniformly per ray.

    Given the [R, S] validity mask, returns
      sel      [budget] — flat indices into the slot-major [S*R] order,
      inv      [S*R]    — inverse permutation (position -> rank),
      kept     [R, S]   — mask of slots that made the budget.

    The TPU analogue of nerfacc's packed sampling (reference:
    nersemble_volumetric_sampler.py:95-135): instead of a variable-length
    packed list, a fixed ``budget`` of samples is evaluated, proportional to
    the actual slot fill of the whole batch rather than the R*S worst case.
    Slot-major ordering means overflow removes the deepest slots (lowest
    transmittance) across all rays first — the same far-tail-drop semantics
    as the per-ray slot cap.
    """
    R, S = mask.shape
    mask_t = mask.T.reshape(-1)  # slot-major
    # stable argsort on ~valid: valid entries first, (slot, ray) order kept
    order = jnp.argsort(~mask_t, stable=True)
    inv = jnp.argsort(order)
    sel = order[:budget]
    kept = mask_t & (inv < budget)
    return sel, inv, order, kept.reshape(S, R).T


def compact_samples_monotone(mask: jnp.ndarray, budget: int):
    """``compact_samples`` fast path for PER-RAY-MONOTONE masks.

    ``march_rays`` compacts each ray's valid candidates to a slot PREFIX
    (``mask[r, s] == (s < n[r])``), so the slot-major stable argsort that
    ``compact_samples`` runs over all R*S keys (~14 ms/step at the flagship
    1M keys, PERF.md round 4) has a closed form: sort the R rays once by
    fill count, and the valid positions of every slot are a prefix of that
    ray order — a "staircase". Rank arithmetic then replaces the sort:

        order   = argsort(-n)            (R keys — trivial)
        c[s]    = #rays with n > s       (valid rays at slot s)
        C       = exclusive cumsum of c  (rank of slot s's first valid pos)
        rank(s, r) = C[s] + position of r in `order`

    Returns (sel [budget] flat slot-major indices, kept [R, S]) — no
    inverse permutation (callers on this path route results back with
    ``scatter_rows_back``). Padding ranks past the total valid count map to
    INVALID positions via the complementary staircase, so ``sel`` stays
    duplicate-free (a ``scatter_rows_back`` requirement).

    Semantics vs ``compact_samples``: the kept SET is identical whenever the
    budget covers all valid samples (the adaptive-budget steady state, 1.3x
    headroom). On overflow steps the partially-kept boundary slot keeps the
    deepest-fill rays instead of the lowest ray indices — an equally
    arbitrary far-tail drop (both remove lowest-transmittance samples
    first).
    """
    R, S = mask.shape
    n = jnp.sum(mask, axis=1, dtype=jnp.int32)  # [R] per-ray fill
    order = jnp.argsort(-n, stable=True)        # rays by fill, descending
    inv_order = jnp.argsort(order)              # rank of each ray (R keys)
    n_sorted = jnp.take(n, order)
    # c[s] = #rays with n > s; n_sorted is descending, so count via a
    # comparison matrix (tiny: [S, R] bools — no searchsorted scalar gathers)
    slots = jnp.arange(S, dtype=jnp.int32)
    c = jnp.sum(n_sorted[None, :] > slots[:, None], axis=1,
                dtype=jnp.int32)  # [S]
    C = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(c)])  # [S+1]
    total = C[S]

    j = jnp.arange(budget, dtype=jnp.int32)

    def staircase_positions(C_, rank):
        # slot of each rank: how many slot prefixes end at or before it
        # ([budget, S] comparison matrix + row sum — VPU-cheap)
        s = jnp.sum(C_[None, 1:] <= rank[:, None], axis=1,
                    dtype=jnp.int32)  # [budget], in [0, S)
        s = jnp.minimum(s, S - 1)
        base = jnp.max(jnp.where(C_[None, :-1] <= rank[:, None],
                                 C_[None, :-1], 0), axis=1)  # C_[s]
        return s, rank - base

    sv, pv = staircase_positions(C, j)                       # valid ranks
    # complementary staircase for padding ranks (invalid positions, slot s
    # holds R - c[s] of them, at permuted ray ranks [c[s], R))
    Ci = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.cumsum(R - c)])                # [S+1]
    si, qi = staircase_positions(Ci, j - total)
    pi = jnp.take(c, si) + qi
    s = jnp.where(j < total, sv, si)
    p = jnp.clip(jnp.where(j < total, pv, pi), 0, R - 1)
    sel = s * R + jnp.take(order, p)

    kept = mask & (C[None, :S] + inv_order[:, None] < budget)
    return sel, kept


def quantized_budget(measured_samples: float, n_rays: int, n_slots: int,
                     headroom: float = 1.15,
                     current: Optional[int] = None) -> int:
    """Next train-step compaction budget from a measured valid-sample count.

    Quantized to 1/128ths of R*S (each distinct value costs one re-jit of
    the train step, so changes must be coarse and rare) with hysteresis:
    grow immediately when the measured fill approaches the budget, shrink
    only when clearly (>= 1 quantum) below — as the occupancy grid carves,
    real fill falls to a few %% of R*S and the budget follows it down.
    Quantum and headroom are sized so the steady-state step does as little
    dead work as the re-jit economy allows: at the converged static fill
    (~63k valid samples, R=4096 x S=256) the round-4 policy (1/32 quantum,
    x1.3 headroom) landed at 98,304 — 36%% padding rows in every
    gather/scatter; 1/128 + x1.15 lands at 73,728 (14%% padding), ~25%%
    fewer table-op rows per step. Shrinks only fire at interval boundaries
    and the hysteresis quantum (8,192 rows at flagship size) exceeds the
    measured +/-5%% steady-state fill fluctuation, so the step still re-jits
    only a handful of times per run. The tighter headroom is safe because
    the trainer grows the budget within ~25 steps of any sampled step
    dropping >2%% of its samples.
    """
    total = n_rays * n_slots
    quantum = max(total // 128, 128)
    q = -(-int(measured_samples * headroom) // quantum) * quantum
    q = min(max(q, quantum), total)
    if current is not None:
        if q > current:
            return q
        if q <= current - quantum:
            return q
        return current
    return q


def ray_aabb_intersect(origins: jnp.ndarray, directions: jnp.ndarray,
                       aabb_min: jnp.ndarray, aabb_max: jnp.ndarray):
    """Slab intersection: [R, 3] rays x AABB -> (t_near [R], t_far [R]).

    Misses yield t_near > t_far. Degenerate direction components are handled
    by the +-inf arithmetic of the division.
    """
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-12,
                          jnp.where(directions >= 0, 1e-12, -1e-12), directions)
    t0 = (aabb_min[None, :] - origins) * inv
    t1 = (aabb_max[None, :] - origins) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_near, t_far


def level_aabb(aabb_min: jnp.ndarray, aabb_max: jnp.ndarray, level: int):
    """AABB of occupancy-grid cascade ``level``: the base box scaled by
    ``2**level`` about its center (nerfacc ``OccGridEstimator`` levels)."""
    center = (aabb_min + aabb_max) * 0.5
    half = (aabb_max - aabb_min) * (0.5 * (2.0 ** level))
    return center - half, center + half


def occupancy_lookup(binaries: jnp.ndarray, positions: jnp.ndarray,
                     aabb_min: jnp.ndarray, aabb_max: jnp.ndarray) -> jnp.ndarray:
    """Query the binary grid at [..., 3] world positions.

    ``binaries`` is [G, G, G] (single level) or [L, G, G, G] (cascade: level
    ``l`` covers the base AABB scaled by ``2**l``; a position is judged by the
    FINEST level containing it, like nerfacc's multi-level traversal).
    Positions outside every level are unoccupied.
    """
    if binaries.ndim == 3:
        binaries = binaries[None]
    n_levels = binaries.shape[0]
    occ = jnp.zeros(positions.shape[:-1], bool)
    # coarse -> fine: finer levels overwrite where they contain the position
    for lvl in reversed(range(n_levels)):
        lo, hi = level_aabb(aabb_min, aabb_max, lvl)
        g = jnp.asarray(binaries.shape[1:], jnp.int32)
        norm = (positions - lo) / (hi - lo)
        cell = jnp.floor(norm * g).astype(jnp.int32)
        in_bounds = jnp.all((cell >= 0) & (cell < g), axis=-1)
        cell = jnp.clip(cell, 0, g - 1)
        flat = (cell[..., 0] * g[1] + cell[..., 1]) * g[2] + cell[..., 2]
        occ_l = jnp.take(binaries[lvl].reshape(-1), flat)
        occ = jnp.where(in_bounds, occ_l, occ)
    return occ


def cone_march_ts(t_near: jnp.ndarray, steps: jnp.ndarray,
                  render_step_size: float, cone_angle: float) -> jnp.ndarray:
    """Closed form of nerfacc's growing-step march at fractional step index.

    nerfacc advances ``t += max(t * cone_angle, dt_min)``: steps are uniform
    ``dt_min`` until ``t`` reaches ``t_switch = dt_min / cone_angle``, then
    geometric with ratio ``1 + cone_angle``. Both phases have closed forms,
    so the whole comb is generated with one vectorized expression instead of
    a sequential recurrence (no lax.scan on the hot path):

        f(k) = t_near + k * dt_min                      for k <= k0
             = (t_near + k0 * dt_min) * (1 + c)^(k - k0)  for k >  k0

    with ``k0 = ceil(max(t_switch - t_near, 0) / dt_min)`` the per-ray count
    of uniform steps. Continuous at k0; exact for integer k. Fractional k
    (stratified jitter) interpolates linearly / log-linearly within a step.
    """
    dt, c = render_step_size, cone_angle
    t_switch = dt / c
    k0 = jnp.ceil(jnp.maximum(t_switch - t_near, 0.0) / dt)  # [R]
    t_base = t_near + k0 * dt
    k = steps  # [R, N] or broadcastable
    linear = t_near[:, None] + k * dt
    geometric = t_base[:, None] * jnp.exp((k - k0[:, None]) * float(np.log1p(c)))
    return jnp.where(k <= k0[:, None], linear, geometric)


def march_range(origins, directions, aabb_min, aabb_max, binaries,
                near_plane: float, far_plane: float):
    """Per-ray [t_near, t_far] march range: AABB slab intersection against
    the COARSEST cascade level's box, clipped to the near/far planes."""
    outer_min, outer_max = aabb_min, aabb_max
    if binaries is not None and binaries.ndim == 4 and binaries.shape[0] > 1:
        outer_min, outer_max = level_aabb(aabb_min, aabb_max,
                                          binaries.shape[0] - 1)
    t_near, t_far = ray_aabb_intersect(origins, directions, outer_min, outer_max)
    t_near = jnp.maximum(t_near, near_plane)
    t_far = jnp.minimum(t_far, far_plane)
    return t_near, t_far


def dilate_binaries(binaries: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 max-pool (one-cell dilation) of a [G,G,G] or [L,G,G,G] binary
    grid. Used by the eval-time coarse prefilter: probing a DILATED grid at
    a stride of up to ~2 cell widths cannot miss an occupied cell of the
    real grid (the dilated target is >= 3 cells wide along the ray)."""
    squeeze = binaries.ndim == 3
    if squeeze:
        binaries = binaries[None]
    b = binaries
    for axis in (1, 2, 3):
        shifted_fwd = jnp.concatenate(
            [b.take(jnp.arange(1, b.shape[axis]), axis=axis),
             b.take(jnp.array([b.shape[axis] - 1]), axis=axis)], axis=axis)
        shifted_bwd = jnp.concatenate(
            [b.take(jnp.array([0]), axis=axis),
             b.take(jnp.arange(0, b.shape[axis] - 1), axis=axis)], axis=axis)
        b = b | shifted_fwd | shifted_bwd
    return b[0] if squeeze else b


def occupied_world_aabb(binaries: jnp.ndarray, aabb_min: jnp.ndarray,
                        aabb_max: jnp.ndarray, expand_cells: float = 2.0):
    """World-space AABB of the occupied cells (union over cascade levels),
    each level's box expanded by ``expand_cells`` of that level's cell width.

    Basis of the eval render path's RAY PACKING (engine/trainer.render_image):
    every sample the eval march can mark valid lies within 2 level-l cells of
    an occupied level-l cell — strided probing tests a one-cell-DILATED grid
    (<= 1 cell from an occupied cell) and a probe vouches for samples within
    ``(stride/2) * render_step_size <= 1`` base cell of it (see march_rays
    ``occupancy_stride``; the two-phase cone-angle path probes the exact grid
    at stride 1, which the same bound covers). A ray whose slab test misses
    this expanded box therefore has NO valid samples and renders exact
    background — it can be skipped without evaluating anything.

    Returns ``(lo [3], hi [3], any_occ scalar bool)``; when nothing is
    occupied ``any_occ`` is False (lo/hi are meaningless).
    """
    if binaries.ndim == 3:
        binaries = binaries[None]
    big = jnp.float32(3.4e38)
    lo_all = jnp.full((3,), big, jnp.float32)
    hi_all = jnp.full((3,), -big, jnp.float32)
    any_all = jnp.asarray(False)
    for lvl in range(binaries.shape[0]):
        lo_l, hi_l = level_aabb(aabb_min, aabb_max, lvl)
        b = binaries[lvl]
        cell = (hi_l - lo_l) / jnp.asarray(b.shape, jnp.float32)
        any_l = jnp.any(b)
        mins, maxs = [], []
        for ax in range(3):
            occ = jnp.any(b, axis=tuple(a for a in range(3) if a != ax))
            idx = jnp.arange(b.shape[ax], dtype=jnp.int32)
            mins.append(jnp.min(jnp.where(occ, idx, b.shape[ax])))
            maxs.append(jnp.max(jnp.where(occ, idx + 1, 0)))
        mn = jnp.stack(mins).astype(jnp.float32) - expand_cells
        mx = jnp.stack(maxs).astype(jnp.float32) + expand_cells
        lo_w = lo_l.astype(jnp.float32) + mn * cell
        hi_w = lo_l.astype(jnp.float32) + mx * cell
        lo_all = jnp.where(any_l, jnp.minimum(lo_all, lo_w), lo_all)
        hi_all = jnp.where(any_l, jnp.maximum(hi_all, hi_w), hi_all)
        any_all = any_all | any_l
    return lo_all, hi_all, any_all


def coarse_entry_steps(origins: jnp.ndarray,
                       directions: jnp.ndarray,
                       t_near: jnp.ndarray,
                       t_far: jnp.ndarray,
                       dilated_binaries: jnp.ndarray,
                       aabb_min: jnp.ndarray,
                       aabb_max: jnp.ndarray,
                       render_step_size: float,
                       n_candidates: int,
                       stride: int,
                       cone_angle: float = 0.0) -> jnp.ndarray:
    """Per-ray fractional step index of the first occupied coarse probe.

    Probes the DILATED occupancy grid every ``stride`` candidate steps over
    the full candidate comb; returns the (conservative, one-stride-early)
    step index k0 >= 0 at which fine marching should start. Rays with no
    coarse hit return the step index past t_far (their fine window is empty
    — they render background exactly as the full march would).
    """
    n_coarse = -(-n_candidates // stride)
    k = (jnp.arange(n_coarse, dtype=origins.dtype) * stride)[None, :]  # [R,C]
    if cone_angle > 0.0:
        ts = cone_march_ts(t_near, k + 0.5 * stride, render_step_size,
                           cone_angle)
    else:
        ts = t_near[:, None] + (k + 0.5 * stride) * render_step_size
    pos = origins[:, None, :] + directions[:, None, :] * ts[..., None]
    occ = occupancy_lookup(dilated_binaries, pos, aabb_min, aabb_max)
    occ = occ & (ts < t_far[:, None])
    any_hit = jnp.any(occ, axis=-1)
    first = jnp.argmax(occ, axis=-1)  # first True (0 when none)
    k0 = jnp.maximum(first - 1, 0).astype(origins.dtype) * stride
    # no coarse hit: start past t_far so every fine candidate is invalid
    return jnp.where(any_hit, k0, jnp.float32(n_candidates))


def march_rays(origins: jnp.ndarray,
               directions: jnp.ndarray,
               aabb_min: jnp.ndarray,
               aabb_max: jnp.ndarray,
               render_step_size: float,
               n_candidates: int,
               max_samples_per_ray: int,
               binaries: Optional[jnp.ndarray] = None,
               near_plane: float = 0.0,
               far_plane: float = 1e10,
               jitter: Optional[jnp.ndarray] = None,
               cone_angle: float = 0.0,
               start_steps: Optional[jnp.ndarray] = None,
               occupancy_stride: int = 1):
    """Full sampler: rays -> compacted RaySamples + diagnostics.

    jitter: optional [R] uniforms in [0,1) shifting each ray's sample comb
    (training-time stratification). None centers samples (+0.5 offset would
    deviate from nerfacc, which starts at the near point; we use 0).
    cone_angle > 0 grows the step size with distance (nerfacc:
    ``dt = max(t * cone_angle, render_step_size)`` — see cone_march_ts).
    binaries may be a [L, G, G, G] cascade; the march range then spans the
    COARSEST level's AABB (base scaled by 2^(L-1)).
    start_steps: optional [R] per-ray step offsets added to the candidate
    comb (the coarse-prefilter entry points, see coarse_entry_steps) — the
    fine window then covers steps [start, start + n_candidates).
    occupancy_stride > 1: probe ``binaries`` once per ``stride`` candidates
    (at the group's t-center) and let the result vouch for the whole group —
    the eval-path fast mode. REQUIRES a dilated grid (see dilate_binaries)
    and (stride/2)*render_step_size <= one cell, so a probe can never sit
    outside the dilated footprint of a cell one of its group's samples is
    in: the marked-valid set is then a superset of the exact march's (extra
    members only border occupied cells; alpha_thre pruning removes them).
    Returns (RaySamples, info dict).
    """
    t_near, t_far = march_range(origins, directions, aabb_min, aabb_max,
                                binaries, near_plane, far_plane)

    steps = jnp.arange(n_candidates, dtype=origins.dtype)  # [N]
    if jitter is None:
        jitter = jnp.zeros_like(t_near)
    offset = jitter if start_steps is None else jitter + start_steps
    if cone_angle > 0.0:
        k = steps[None, :] + offset[:, None]  # [R, N]
        t0 = cone_march_ts(t_near, k, render_step_size, cone_angle)
        t1 = cone_march_ts(t_near, k + 1.0, render_step_size, cone_angle)
    else:
        t0 = t_near[:, None] + (steps[None, :] + offset[:, None]) * render_step_size
        t1 = t0 + render_step_size
    mids = (t0 + t1) * 0.5
    valid = mids < t_far[:, None]  # [R, N]

    if binaries is not None:
        if occupancy_stride > 1:
            # one probe per stride-group, at the group's center step index
            # (max |probe - sample| = (stride/2) * dt — see docstring)
            n_probe = -(-n_candidates // occupancy_stride)
            kp = (jnp.arange(n_probe, dtype=origins.dtype) * occupancy_stride
                  + 0.5 * occupancy_stride)[None, :] + offset[:, None]
            if cone_angle > 0.0:
                tp = cone_march_ts(t_near, kp, render_step_size, cone_angle)
            else:
                tp = t_near[:, None] + kp * render_step_size
            posp = origins[:, None, :] + directions[:, None, :] * tp[..., None]
            occ_p = occupancy_lookup(binaries, posp, aabb_min, aabb_max)
            occupied = jnp.repeat(occ_p, occupancy_stride,
                                  axis=1)[:, :n_candidates]
        else:
            pos = origins[:, None, :] + directions[:, None, :] * mids[..., None]
            occupied = occupancy_lookup(binaries, pos, aabb_min, aabb_max)
        valid = valid & occupied

    # Compaction via top_k on an index key: the S smallest candidate indices
    # among the valid ones are exactly the first S valid samples (ascending t
    # preserved). Much cheaper on TPU than a full [R, n_candidates] sort.
    big = jnp.int32(n_candidates + 1)
    key = jnp.where(valid, jnp.arange(n_candidates, dtype=jnp.int32)[None, :],
                    big)
    neg_vals, order = jax.lax.top_k(-key, max_samples_per_ray)
    # t of the selected slots: RECOMPUTED from the step index (the same
    # closed form that built t0/t1) instead of take_along_axis — the two
    # [R, S] element gathers from [R, n_candidates] ran at the scalar-gather
    # floor, ~32 ms/step of the flagship bench (PERF.md round 3b trace)
    k_sel = order.astype(origins.dtype) + offset[:, None]
    if cone_angle > 0.0:
        t_starts = cone_march_ts(t_near, k_sel, render_step_size, cone_angle)
        t_ends = cone_march_ts(t_near, k_sel + 1.0, render_step_size,
                               cone_angle)
    else:
        t_starts = t_near[:, None] + k_sel * render_step_size
        t_ends = t_starts + render_step_size
    mask = neg_vals > -big

    n_valid_total = jnp.sum(valid, axis=-1)
    info = {
        "n_samples_per_ray": jnp.sum(mask, axis=-1),
        "n_dropped_per_ray": jnp.maximum(n_valid_total - max_samples_per_ray, 0),
        "t_near": t_near,
        "t_far": t_far,
    }
    return RaySamples(t_starts=t_starts, t_ends=t_ends, mask=mask), info
