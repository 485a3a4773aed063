"""Multiresolution hash-grid encoding — TPU-native (xz-quad row gathers).

Replaces tcnn's CUDA HashGrid encoding (reference: hash_ensemble.py:41-52,
nersemble_nerfacto_field.py:127-140). Same structure as Instant-NGP:

- L levels with geometrically growing resolution ``scale_l = base * growth^l``.
- Levels whose dense grid fits in the table are indexed densely; larger levels
  use a spatial hash (table size a power of two).
- Trilinear interpolation of the 8 cell corners (optionally smoothstep).

TPU performance design (measured on v5e; history in PERF.md):

1. **Row gathers, not element gathers.** XLA's TPU gather/scatter are per-row
   overhead bound (~tens of millions of rows/s regardless of row width up to
   at least 512-byte rows), so the number of rows is THE cost. All H logical
   tables of the ensemble share indices, so the whole ensemble is ONE array
   whose row packs every logical table's features (W = H * F_l).
2. **XZ-quad rows** (this file's core trick): the index layout is chosen so
   that BOTH the x+1 and the z+1 neighbor of any vertex are a FIXED per-level
   stride away (dense levels: ``idx = y + SX*x + SZ*z`` with tile-aligned
   SX, SZ; hashed levels: an additive hash ``idx = (y*p1 + x*SX + z*SZ) mod 2^M``
   — unlike tcnn's pure-XOR hash, whose neighbors are data-dependent). The
   per-step ``build_quad_table`` packs each entry's own features and those of
   its x-, z- and xz-successors into one [E, 4W] row (cheap tile-aligned
   per-level ``jnp.roll``s, pure contiguous copies), so ONE gathered row
   serves FOUR corners of a cell: 2 gathered rows per (sample, level) — the
   two y corners — instead of the naive 8, and the backward scatter-add rows
   shrink 4x too. Gather/scatter BYTES are unchanged (same total features
   moved); only the per-row overhead count drops. For the flagship ensemble
   (W = 64) the quad width 4W = 256 bf16 = 512 B/row stays on the measured
   fast path.
3. **Tile-layout discipline.** All materialized tensors are 1-D/2-D with a
   large minor dim; corner/table reductions run as matmuls against constant
   0/1 selection matrices on the MXU (built on device from iota comparisons),
   or as corner-major slice-adds. The [N, L*F, H] embedding tensor of the
   reference (hash_ensemble.py:112-156) is never materialized.
4. **Custom VJP** saving only small blend residuals — backward needs NO
   re-gather, and the table gradient rows are built analytically and
   scattered once (into the quad layout; autodiff through the differentiable
   quad build folds the three successor quarters back onto the canonical
   entries with inverse rolls).
5. **bf16 quad table**: the gathered operand is bf16 (halves gather traffic
   and the quad-table copy); master params stay f32. The backward scatter-add
   accumulates the HOT dense-prefix rows in f32 (bf16 SATURATES there:
   once the sum exceeds ~256x an increment the 8-bit mantissa truncates
   every late add — measured -50..-80% gradient mass) and the sparse hashed
   levels in the table dtype (production fill is a few rows/entry, where
   bf16 is accurate; tcnn fp16-atomics precedent).
6. **Tensor parallelism** = shard the canonical table's FEATURE axis
   [E, W] -> [E, W/devices]; the quad build concatenates along that same
   axis and GSPMD turns the blend matmul's contraction into an all-reduce
   (SURVEY.md section 2c).

Boundary semantics note: at the far x or z edge of a level (floor == res-1,
possible only in the outermost half-cell of the unit cube) the quad row's
successor quarters belong to a wrapped vertex rather than tcnn's clamped
duplicate (dense levels: the x wrap aliases the (0, z+1) column's entry).
The blend weight of such a corner is continuous through the cell boundary,
so the encoding stays continuous; the outermost half-cell simply trains
against a different (possibly shared) parameter than under clamping.
"""

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nersemble_tpu.ops import quad_pallas

_PRIMES = (np.uint32(2654435761), np.uint32(805459861), np.uint32(3674653429))
# quarter order within a quad row: q = 2 * xbit + zbit
# (q0 = (x,z), q1 = (x,z+1), q2 = (x+1,z), q3 = (x+1,z+1))
_N_QUARTERS = 4


@dataclass(frozen=True)
class HashGridLevels:
    """Static per-level layout (baked into the jitted computation)."""

    n_levels: int
    scales: Tuple[float, ...]
    resolutions: Tuple[int, ...]
    sizes: Tuple[int, ...]
    hashed: Tuple[bool, ...]
    offsets: Tuple[int, ...]
    total_entries: int
    log2_hashmap_size: int
    x_strides: Tuple[int, ...]
    z_strides: Tuple[int, ...]

    @staticmethod
    def create(n_levels: int = 16, log2_hashmap_size: int = 19,
               base_resolution: int = 16,
               per_level_scale: float = 1.4472692012786865) -> "HashGridLevels":
        """Every segment size, offset, and x/z-stride is a multiple of 32
        rows, so the per-level rolls/slices of build_quad_table (and their
        gradient fold) stay tile-aligned for both f32 (8-row) and bf16
        (16-row) sublane tiles with headroom. Misaligned rolls measured
        211 ms vs ~10 ms on v5e round 1.

        DENSE level sizes are additionally padded up to multiples of
        ``quad_pallas.BLOCK`` (2048) rows so the Pallas quad build/fold
        kernels can block the entry axis uniformly. The padding rows are
        dead parameters (base-corner indices are always < the unpadded
        dense size); roll successors at the far x/z boundary land in the
        padding instead of aliasing a real entry — strictly cleaner than
        the previous wrap (see the boundary-semantics note above). Hashed
        levels stay exactly 2^log2_hashmap_size (the additive hash's
        modulus IS the roll modulus, so it cannot be padded); tables whose
        hashed levels are smaller than one block simply fall back to the
        XLA build path."""
        align = 32
        block = quad_pallas.BLOCK
        max_size = 2 ** log2_hashmap_size
        mask = max_size - 1
        scales, resolutions, sizes, hashed, offsets = [], [], [], [], []
        sxs, szs = [], []
        offset = 0
        for l in range(n_levels):
            scale = base_resolution * per_level_scale ** l
            res = int(np.ceil(scale)) + 1
            # dense layout idx = y + SX*x + SZ*z with the x column padded to
            # a sublane multiple (so both successor strides are tile-aligned)
            sx = -(-res // align) * align
            sz = sx * res
            dense_size = sz * res
            if dense_size <= max_size:
                # CHECKPOINT-FORMAT NOTE (round 4): padding dense level
                # sizes to BLOCK multiples changed offsets/total_entries, so
                # checkpoints written before the Pallas quad-build kernel
                # landed fail to load with a shape-mismatch error
                # (checkpoints.py raises with both shapes). The padding rows
                # are provably dead (never indexed); older checkpoints can
                # be migrated by zero-padding each dense segment to the new
                # layout. No such pre-break checkpoints are in circulation.
                size = -(-dense_size // block) * block
                is_hashed = False
            else:
                size, is_hashed = max_size, True
                # tile-aligned additive strides: the low bits of the bucket
                # come from the y hash only; x-only / z-only neighbor pairs
                # never collide in-range (dx * sx != 0 mod 2^M for dx < res)
                sx = (int(_PRIMES[1]) & mask) & ~(align - 1)
                sz = (int(_PRIMES[2]) & mask) & ~(align - 1)
            scales.append(float(scale))
            resolutions.append(res)
            sizes.append(size)
            hashed.append(is_hashed)
            offsets.append(offset)
            sxs.append(sx)
            szs.append(sz)
            offset += size
        return HashGridLevels(n_levels, tuple(scales), tuple(resolutions),
                              tuple(sizes), tuple(hashed), tuple(offsets),
                              offset, log2_hashmap_size, tuple(sxs),
                              tuple(szs))


def init_hash_table(rng, levels: HashGridLevels, row_width: int,
                    dtype=jnp.float32, init_scale: float = 1e-4) -> jnp.ndarray:
    """[E, W] canonical table, U(-1e-4, 1e-4) like tcnn's HashGrid default.

    Row e packs the features of ALL logical tables at entry e
    (column h * F_l + f = logical table h, feature f).
    """
    return jax.random.uniform(rng, (levels.total_entries, row_width), dtype,
                              -init_scale, init_scale)


def _roll_levels(table: jnp.ndarray, levels: HashGridLevels,
                 strides: Tuple[int, ...]) -> jnp.ndarray:
    """Per-level cyclic roll by -stride rows (pure contiguous copies).

    (A row-paired [E/2, 2W] variant for full-tile copies was tried and
    REVERTED: the reshape boundaries around each rolled copy broke XLA
    fusion and materialized ~3 GB of extra table copies, OOMing the
    flagship train step.)"""
    segs = []
    for l in range(levels.n_levels):
        seg = jax.lax.slice_in_dim(table, levels.offsets[l],
                                   levels.offsets[l] + levels.sizes[l], axis=0)
        segs.append(jnp.roll(seg, -(strides[l] % levels.sizes[l]), axis=0))
    return jnp.concatenate(segs, axis=0)


def build_quad_table(table: jnp.ndarray, levels: HashGridLevels,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """[E, W] canonical -> [E, 4W] xz-quad gather operand.

    Row e = [feat(e) | feat(z-succ) | feat(x-succ) | feat(xz-succ)]; each
    successor is ``(e - off_l + stride_l) % size_l + off_l`` — per-level
    cyclic rolls, i.e. pure contiguous copies (HBM-bandwidth bound, ~ms for
    the flagship table). Differentiable: the transpose folds the successor
    gradient quarters back onto the canonical entries with inverse rolls.

    The cast runs FIRST (rolls then move half the bytes); under the
    entry-sharded (ZeRO-3) table layout the caller may want the replication
    collective between the cast and the rolls — use
    ``quad_from_cast(table.astype(dtype), levels)`` directly for that.
    """
    return quad_from_cast(table.astype(dtype), levels)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def quad_from_cast(table: jnp.ndarray, levels: HashGridLevels) -> jnp.ndarray:
    """Quad build on an already-cast table, with a hand-written transpose.

    Forward: ONE concat of four rolled copies (no [E, 2W] pair intermediate —
    that extra 1.5 GB materialization OOMed the flagship step on a 16 GB
    chip). Backward ("the quad-gradient fold"): the autodiff transpose
    materialized three full-table rolled gradient copies plus a 4-way add —
    measured 39 ms/step on v5e for the flagship table. The custom backward
    folds per LEVEL SEGMENT (one fused slice+3-roll+add pass per level, f32
    accumulation element-wise), touching each gradient byte once.
    """
    return _quad_fwd_impl(table, levels)


def _quad_fwd_impl(table, levels):
    import os
    if (os.environ.get("NERSEMBLE_QUAD_PALLAS", "1") != "0"
            and quad_pallas.available(levels, table.shape[1])):
        # Pallas kernel: composes full-width [BLOCK, 4W] output tiles in
        # VMEM (contiguous writes). The XLA concat below writes each 64-col
        # quarter band as a 128 B strided stream — 74.4 ms vs the kernel's
        # 64.1 ms for the flagship table in ISOLATION
        # (scripts/bench_quad_build.py, r4). NERSEMBLE_QUAD_PALLAS=0 forces
        # the XLA path — the IN-STEP A/B knob (the round-4a step trace put
        # the XLA build at ~40 ms inside the full step, so isolation wins
        # do not automatically transfer).
        return quad_pallas.build(table, levels)
    return _quad_fwd_xla(table, levels)


def _quad_fwd_xla(table, levels):
    xz = tuple(sx + sz for sx, sz in zip(levels.x_strides, levels.z_strides))
    return jnp.concatenate(
        [table,
         _roll_levels(table, levels, levels.z_strides),
         _roll_levels(table, levels, levels.x_strides),
         _roll_levels(table, levels, xz)], axis=1)


def _quad_vjp_fwd(table, levels):
    return _quad_fwd_impl(table, levels), None


def _quad_vjp_bwd(levels, _res, g):
    """d_quad [E, 4W] -> d_canonical [E, W]: per-level fused fold.

    Quarter q's gradient for canonical entry e lives at quad row
    ``(e - stride_q) % size_l`` — an INVERSE (positive) roll. Slicing the
    level segment first keeps each roll+add a small fusable unit; arithmetic
    is f32 regardless of the (usually bf16) gradient dtype.
    """
    # The Pallas fold kernel LOSES to this XLA fold (74.7 vs 61.6 ms on the
    # flagship table, scripts/bench_quad_build.py r4): the 64-column quarter
    # bands are narrower than the 128-lane tile, forcing the kernel to fetch
    # full-width blocks (2x HBM read amplification). Keep the XLA path.
    return (_quad_bwd_xla(g, levels),)


def _quad_bwd_xla(g, levels):
    W = g.shape[1] // _N_QUARTERS
    segs = []
    for l in range(levels.n_levels):
        size = levels.sizes[l]
        seg = jax.lax.slice_in_dim(g, levels.offsets[l],
                                   levels.offsets[l] + size, axis=0)
        sx = levels.x_strides[l] % size
        sz = levels.z_strides[l] % size
        acc = seg[:, :W].astype(jnp.float32) \
            + jnp.roll(seg[:, W:2 * W], sz, axis=0).astype(jnp.float32) \
            + jnp.roll(seg[:, 2 * W:3 * W], sx, axis=0).astype(jnp.float32) \
            + jnp.roll(seg[:, 3 * W:4 * W], (sx + sz) % size,
                       axis=0).astype(jnp.float32)
        segs.append(acc.astype(g.dtype))
    return jnp.concatenate(segs, axis=0)


quad_from_cast.defvjp(_quad_vjp_fwd, _quad_vjp_bwd)


def hash_grid_indices(x: jnp.ndarray, levels: HashGridLevels,
                      smoothstep: bool = False):
    """Corner indices and interpolation weights for [N, 3] positions in [0,1].

    Returns (entry_idx [N, 2L] int32, wy [N, 2L] f32, fx [N, L] f32,
    fz [N, L] f32) in CORNER-MAJOR column order: column c * L + l is y-corner
    c of level l. ``wy`` are the linear y weights; ``fx``/``fz`` the x/z
    interpolation fractions resolved inside the quad row. All are
    differentiable w.r.t. ``x`` — that is how gradients reach the deformation
    field through the encoding.

    All math is done on [N] columns and stacked once, so no intermediate has
    a tiny minor dimension (TPU tile-padding safety).
    """
    px_all = [x[:, 0], x[:, 1], x[:, 2]]
    mask = np.uint32(2 ** levels.log2_hashmap_size - 1)

    idx_cols = [[], []]
    w_cols = [[], []]
    fx_cols, fz_cols = [], []
    for l in range(levels.n_levels):
        scale = levels.scales[l]
        res = levels.resolutions[l]
        grid, frac = [], []
        for d in range(3):
            pos = px_all[d] * scale + 0.5
            g = jnp.floor(pos)
            f = pos - g
            if smoothstep:
                f = f * f * (3.0 - 2.0 * f)
            grid.append(g.astype(jnp.int32))
            frac.append(f)
        cx = jnp.clip(grid[0], 0, res - 1)
        cz = jnp.clip(grid[2], 0, res - 1)
        fx_cols.append(frac[0])
        fz_cols.append(frac[2])
        for c in (0, 1):
            cy = jnp.clip(grid[1] + c, 0, res - 1)
            if levels.hashed[l]:
                h = (cy.astype(jnp.uint32) * _PRIMES[0]
                     + cx.astype(jnp.uint32) * np.uint32(levels.x_strides[l])
                     + cz.astype(jnp.uint32) * np.uint32(levels.z_strides[l]))
                idx = (h & mask).astype(jnp.int32)
            else:
                idx = cy + levels.x_strides[l] * cx + levels.z_strides[l] * cz
            idx_cols[c].append(idx + levels.offsets[l])
            w_cols[c].append(frac[1] if c else 1.0 - frac[1])
    flat_idx = [col for group in idx_cols for col in group]
    flat_w = [col for group in w_cols for col in group]
    entry_idx = jnp.stack(flat_idx, axis=1)
    wy = jnp.stack(flat_w, axis=1)
    fx = jnp.stack(fx_cols, axis=1)
    fz = jnp.stack(fz_cols, axis=1)
    return entry_idx, wy, fx, fz


def _gather_rows(table: jnp.ndarray, entry_idx: jnp.ndarray) -> jnp.ndarray:
    """[E, W4] x [N, K] -> [N, K*W4] flat gathered rows (ONE row gather)."""
    n, k = entry_idx.shape
    rows = jnp.take(table, entry_idx.reshape(-1), axis=0)  # [N*K, W4]
    return rows.reshape(n, k * table.shape[1])


# --------------------------------------------------------------------------
# column-pattern expansion helpers (2-D/clean-3-D only; see docstring point 3)
# --------------------------------------------------------------------------

def _quarter_pattern(cols, width: int, tile: int) -> jnp.ndarray:
    """4 per-level [N, L] columns -> [N, tile * L * 4 * width] with per-level
    pattern [q0 * width, q1 * width, q2 * width, q3 * width], tiled ``tile``
    times (corner-major)."""
    s = jnp.stack(cols, axis=2)  # [N, L, 4]
    n, L, _ = s.shape
    s = s.reshape(n, 4 * L)
    s = jnp.repeat(s, width, axis=1)  # [N, L * 4 * width]
    return jnp.tile(s, (1, tile)) if tile > 1 else s


def _quad_weights(fx: jnp.ndarray, fz: jnp.ndarray, width: int,
                  tile: int) -> jnp.ndarray:
    """Quarter interpolation weights u_q = wx * wz in quarter order."""
    gx, gz = 1.0 - fx, 1.0 - fz
    return _quarter_pattern([gx * gz, gx * fz, fx * gz, fx * fz], width, tile)


def _expand_gbar(gbar: jnp.ndarray, Fl: int, width: int, tile: int):
    """gbar [N, L*Fl] -> [N, tile * L * width] where column (l, k) carries
    gbar[l, k % Fl] (k in [0, width)), tiled corner-major."""
    n, LFl = gbar.shape
    L = LFl // Fl
    g = jnp.tile(gbar.reshape(n, L, Fl), (1, 1, width // Fl)).reshape(n, L * width)
    return jnp.tile(g, (1, tile)) if tile > 1 else g


def _s_code(H: int, Fl: int, L: int, dtype):
    """[H, 2L*W4] 0/1 expansion: column j carries logical table
    h(j) = ((j % W4) % W) // Fl."""
    W = H * Fl
    W4 = _N_QUARTERS * W
    h = _iota2((H, 2 * L * W4), 0)
    j = _iota2((H, 2 * L * W4), 1)
    return _sel(((j % W4) % W) // Fl == h, dtype)


def _s_wu(L: int, W4: int, dtype):
    """[2L*4, 2L*W4] 0/1 expansion: column j comes from the (corner-level,
    quarter) slot r(j) = (j // W4) * 4 + (j % W4) // W."""
    W = W4 // _N_QUARTERS
    r = _iota2((2 * L * _N_QUARTERS, 2 * L * W4), 0)
    j = _iota2((2 * L * _N_QUARTERS, 2 * L * W4), 1)
    return _sel((j // W4 == r // _N_QUARTERS)
                & ((j % W4) // W == r % _N_QUARTERS), dtype)


def _expand_mm(small: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """Column expansion as an MXU matmul against a 0/1 selection matrix.

    Each output column copies exactly one input column (one-hot rows), so the
    product is exact in any dtype. Measured: jnp.tile/repeat to the wide
    [N, 2L*W4] shape runs as slow VPU data-formatting loops (~56 ms/step in
    the flagship backward); the same expansion on the MXU is ~1 ms."""
    return jnp.dot(small.astype(sel.dtype), sel,
                   preferred_element_type=sel.dtype)


def _code_columns(code: jnp.ndarray, Fl: int, tile: int) -> jnp.ndarray:
    """code [N, H] -> [N, tile * 4 * H * Fl]: the per-column logical-table
    multiplier over one quad row [q0 | q1 | q2 | q3], tiled corner-major.
    (jnp-tile fallback used by small/test paths.)"""
    c = jnp.repeat(code, Fl, axis=1)  # [N, W]
    c = jnp.tile(c, (1, _N_QUARTERS))  # [N, W4]
    return jnp.tile(c, (1, tile)) if tile > 1 else c


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _sel(cond, dtype=jnp.float32):
    return cond.astype(dtype)


def _sum_corners(x: jnp.ndarray, n_corners: int = 2) -> jnp.ndarray:
    """[N, C*B] corner-major -> [N, B] by summing the C contiguous blocks
    (pure aligned slice-adds on the VPU — no reshape, no tile padding)."""
    b = x.shape[1] // n_corners
    out = x[:, :b]
    for c in range(1, n_corners):
        out = out + x[:, c * b:(c + 1) * b]
    return out


# --------------------------------------------------------------------------
# plain encode (single-grid field) — autodiff backward
# --------------------------------------------------------------------------

def hash_encode(quad_table: jnp.ndarray, x: jnp.ndarray,
                levels: HashGridLevels, smoothstep: bool = False) -> jnp.ndarray:
    """Plain encode: quad table [E, 4W], x [N, 3] -> [N, L * W].

    Output layout is level-major [L, W] flattened; for a single-grid field
    (W = features_per_level) this is exactly the tcnn layout.
    """
    W4 = quad_table.shape[1]
    W = W4 // _N_QUARTERS
    L = levels.n_levels
    entry_idx, wy, fx, fz = hash_grid_indices(x, levels, smoothstep)
    n = x.shape[0]

    @jax.checkpoint
    def body(quad_table, entry_idx, wy, fx, fz):
        rows = _gather_rows(quad_table, entry_idx).astype(jnp.float32)
        w_rep = jnp.repeat(wy, W4, axis=1)
        uw = _quad_weights(fx, fz, W, tile=2)
        per_level = _sum_corners(rows * w_rep * uw)  # [N, L*W4]
        # fold the 4 quarters per level
        per_level = per_level.reshape(n, L, W4)
        out = per_level[:, :, :W]
        for q in range(1, _N_QUARTERS):
            out = out + per_level[:, :, q * W:(q + 1) * W]
        return out.reshape(n, L * W)

    return body(quad_table, entry_idx, wy, fx, fz)


# --------------------------------------------------------------------------
# blended encode (hash ensemble) — custom VJP, no backward re-gather
# --------------------------------------------------------------------------

def hash_encode_blended(quad_table: jnp.ndarray, x: jnp.ndarray,
                        code: jnp.ndarray, levels: HashGridLevels,
                        features_per_logical: int = 2,
                        smoothstep: bool = False) -> jnp.ndarray:
    """Ensemble encode + per-sample blend: -> [N, L * features_per_logical].

    ``quad_table`` is [E, 4W] with W = H * F_l (H logical tables packed per
    row); ``code`` is [N, H] of already-windowed blend weights. Matches the
    reference's rearrange + einsum (hash_ensemble.py:112, 156):

        out[n, l*Fl+f] = sum_{corner,h} w[n,l,corner] * code[n,h]
                         * table[idx[n,l,corner], h*Fl + f]

    Custom VJP: the backward pass needs NO re-gather. The forward saves two
    compact blend residuals (residual bytes per sample bound the compaction
    budget, so both are stored small and in the table dtype) —
        CG[n, (c,l), q, f] = sum_h code_h * rows       (code-blended quarters)
        BH[n, l, h*Fl+f]   = sum_{c,q} wy * u_q * rows (weight-blended rows,
                                                        quarters folded)
    — from which every gradient follows analytically:
        d rows[(c,l), k] = wy * u_q(k) * code_h(k) * gbar[l, f(k)]  (scatter)
        d wy[(c,l)]      = sum_{q,f} u_q * CG * gbar
        d fx[l]          = sum_{c,q,f} wy * CG * gbar * sx_q * wz_q
        d fz[l]          = sum_{c,q,f} wy * CG * gbar * wx_q * sz_q
        d code[h]        = sum_{l,f} gbar[l, f] * BH[l, h*Fl+f]
    with sx = (-,-,+,+), sz = (-,+,-,+) the quarter sign patterns.
    """
    entry_idx, wy, fx, fz = hash_grid_indices(x, levels, smoothstep)
    return _blended_core(quad_table, code.astype(jnp.float32), entry_idx,
                         wy, fx, fz, levels.n_levels, features_per_logical,
                         dense_split(levels))


def dense_split(levels: HashGridLevels) -> Tuple[int, int]:
    """(n_dense_levels, n_dense_entries): the dense levels are always a
    PREFIX of both the level list and the entry axis (sizes grow
    monotonically until the hash cap), so the hot/cold scatter split below
    is two contiguous slices."""
    for l in range(levels.n_levels):
        if levels.hashed[l]:
            return l, levels.offsets[l]
    return levels.n_levels, levels.total_entries


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _blended_core(quad_table, code, entry_idx, wy, fx, fz, L, Fl, dsplit):
    out, _ = _blended_fwd_impl(quad_table, code, entry_idx, wy, fx, fz, L, Fl)
    return out


def _s_cg(L, W4, Fl, dtype):
    """[2L*W4, 2L*4Fl] 0/1: column j = (cl)*W4 + k maps to
    m = (cl)*4Fl + (k // W)*Fl + (k % W) % Fl (sum over logical tables h)."""
    W = W4 // _N_QUARTERS
    j = _iota2((2 * L * W4, 2 * L * 4 * Fl), 0)
    m = _iota2((2 * L * W4, 2 * L * 4 * Fl), 1)
    k = j % W4
    return _sel((j // W4 == m // (4 * Fl))
                & (k // W == (m % (4 * Fl)) // Fl)
                & ((k % W) % Fl == m % Fl), dtype)


def _s_quarter(L, Fl):
    """[2L*4Fl, 2L*Fl] 0/1: sum the 4 quarters per (corner, level, f)."""
    j = _iota2((2 * L * 4 * Fl, 2 * L * Fl), 0)
    m = _iota2((2 * L * 4 * Fl, 2 * L * Fl), 1)
    return _sel((j // (4 * Fl) == m // Fl) & (j % Fl == m % Fl))


def _blended_fwd_impl(quad_table, code, entry_idx, wy, fx, fz, L, Fl):
    W4 = quad_table.shape[1]
    W = W4 // _N_QUARTERS
    n = code.shape[0]

    rows = _gather_rows(quad_table, entry_idx)  # [N, 2L*W4] (bf16 usually)
    # blend matmuls AND the wide [N, 2L*W4] elementwise expansions run in the
    # quad table's dtype (bf16 in production, f32 in exactness tests); small
    # [N, L]-shaped weight math stays f32 and is cast BEFORE the repeat/tile
    # expansion — the expanded buffers are the step's largest tensors (2 GB
    # each in f32 at the flagship chunk; halving them fixed a 1.2 GB OOM).
    # MXU contractions always accumulate f32.
    mm_dtype = rows.dtype
    H = W // Fl
    code_rep = _expand_mm(code, _s_code(H, Fl, L, mm_dtype))  # [N, 2L*W4]
    # CG[n, (cl)*4Fl + q*Fl + f] = sum_h code * rows
    CG = jnp.dot(rows * code_rep, _s_cg(L, W4, Fl, mm_dtype),
                 preferred_element_type=jnp.float32)  # [N, 2L*4Fl]

    uw_fl = _quad_weights(fx, fz, Fl, tile=2)  # [N, 2L*4Fl] (small: f32)
    G = jnp.dot(CG * uw_fl, _s_quarter(L, Fl),
                preferred_element_type=jnp.float32)  # [N, 2L*Fl]
    w_fl = jnp.repeat(wy, Fl, axis=1)  # [N, 2L*Fl]
    out = _sum_corners(G * w_fl)  # [N, L*Fl]

    # BH[n, l*W + w] = sum_{c,q} wy * u_q * rows (for d_code); the quarter
    # axis is folded out before storing, so the residual is [N, L*W] — 4x
    # smaller than the full weight-blended rows. Residual memory is what
    # caps the compaction budget (every budget sample stores its residuals
    # across the lax.map), so this directly buys budget headroom. The small
    # per-(corner-level, quarter) weights wy * u are combined FIRST, then
    # MXU-expanded to the wide row shape.
    u4 = _quad_weights(fx, fz, 1, tile=1)  # [N, L*4] (l, q)-major
    wu = (wy[:, :, None]
          * jnp.tile(u4, (1, 2)).reshape(n, 2 * L, _N_QUARTERS)
          ).reshape(n, 2 * L * _N_QUARTERS)  # [N, 2L*4] ((cl), q)-major
    wu_rep = _expand_mm(wu, _s_wu(L, W4, mm_dtype))  # [N, 2L*W4]
    B = _sum_corners(rows * wu_rep)  # [N, L*W4] (transient)
    BH = B.reshape(n, L, _N_QUARTERS, W).sum(axis=2).reshape(n, L * W)
    return out, (CG.astype(mm_dtype), BH)


def _blended_vjp_fwd(quad_table, code, entry_idx, wy, fx, fz, L, Fl, dsplit):
    out, (CG, BH) = _blended_fwd_impl(quad_table, code, entry_idx, wy, fx, fz,
                                      L, Fl)
    return out, (CG, BH, code, entry_idx, wy, fx, fz, quad_table.shape)


def _blended_vjp_bwd(L, Fl, dsplit, residuals, gbar):
    CG, BH, code, entry_idx, wy, fx, fz, table_shape = residuals
    E, W4 = table_shape
    W = W4 // _N_QUARTERS
    n = code.shape[0]
    H = code.shape[1]
    gbar = gbar.astype(jnp.float32)  # [N, L*Fl]

    g_q = _expand_gbar(gbar, Fl, 4 * Fl, tile=2)  # [N, 2L*4Fl]
    uw_fl = _quad_weights(fx, fz, Fl, tile=2)

    # d wy: sum over (quarter, f) of CG * u * gbar -> [N, 2L]
    j = _iota2((2 * L * 4 * Fl, 2 * L), 0)
    m = _iota2((2 * L * 4 * Fl, 2 * L), 1)
    s_w = _sel(j // (4 * Fl) == m)
    d_wy = jnp.dot(CG * uw_fl * g_q, s_w, preferred_element_type=jnp.float32)

    # d fx / d fz: signed quarter patterns, summed over (c, q, f) -> [N, L]
    w_4fl = jnp.repeat(wy, 4 * Fl, axis=1)  # [N, 2L*4Fl]
    core = CG * w_4fl * g_q
    gx, gz = 1.0 - fx, 1.0 - fz
    # du/dfx = sx_q * wz_q with sx = (-,-,+,+); du/dfz = wx_q * sz_q, sz=(-,+,-,+)
    pat_fx = _quarter_pattern([-gz, -fz, gz, fz], Fl, tile=2)
    pat_fz = _quarter_pattern([-gx, gx, -fx, fx], Fl, tile=2)
    j = _iota2((2 * L * 4 * Fl, L), 0)
    m = _iota2((2 * L * 4 * Fl, L), 1)
    s_lvl = _sel((j // (4 * Fl)) % L == m)
    d_fx = jnp.dot(core * pat_fx, s_lvl, preferred_element_type=jnp.float32)
    d_fz = jnp.dot(core * pat_fz, s_lvl, preferred_element_type=jnp.float32)

    # d code: BH already carries wy and u with quarters folded, so
    # d_code[h] = sum_{l,f} gbar[l,f] * BH[l, h*Fl + f]
    j = _iota2((L * Fl, L * W), 0)
    m = _iota2((L * Fl, L * W), 1)
    s_gb = _sel((m // W == j // Fl) & ((m % W) % Fl == j % Fl), BH.dtype)
    gb = jnp.dot(gbar.astype(BH.dtype), s_gb,
                 preferred_element_type=BH.dtype)  # [N, L*W] (MXU expansion)
    j = _iota2((L * W, H), 0)
    m = _iota2((L * W, H), 1)
    s_c = _sel((j % W) // Fl == m, BH.dtype)
    d_code = jnp.dot(BH * gb, s_c, preferred_element_type=jnp.float32)

    # d table rows: analytic, then scatter-add. The three sample-small
    # factors (gbar, wy, u) combine on the [N, 2L*4Fl] shape FIRST, then two
    # MXU one-hot matmuls expand to the wide [N, 2L*W4] row shape (S_m is
    # exactly S_cg transposed) — no VPU tile/repeat passes. Everything wide
    # runs in the quad table's dtype (bf16 in production; f32 in tests).
    dt = BH.dtype
    H_ = W // Fl
    m_small = g_q * uw_fl * w_4fl  # [N, 2L*4Fl]
    m_rep = jnp.dot(m_small.astype(dt), _s_cg(L, W4, Fl, dt).T,
                    preferred_element_type=dt)  # [N, 2L*W4]
    code_rep = _expand_mm(code, _s_code(H_, Fl, L, dt))
    d_wide = m_rep * code_rep  # [N, 2L*W4]

    # Scatter accumulation precision (ADVICE r2): HOT entries — the dense
    # coarse levels, where ~N rows land on a few thousand entries — lose
    # gradient mass in bf16 once the running sum exceeds ~256x an increment
    # (8-bit mantissa TRUNCATES every late contribution: the sum saturates,
    # measured -50..-80% mass on hot-cell workloads, tests/test_ops.py).
    # The dense levels are a contiguous PREFIX of both the level list and
    # the entry axis, so the scatter splits in two: dense rows accumulate
    # into a small f32 buffer (~750 MB flagship, cast to the table dtype
    # after), hashed rows stay on the bf16 fast path — their production
    # fill is a few rows/entry (524k entries/level), where bf16 is accurate
    # (tests/test_ops.py spread-workload check), and tcnn's fp16 atomics
    # are the precision precedent. A FULL f32 accumulation was tried and
    # measured: same speed as this split (+20 ms/chunk; strided slices +
    # dual scatter = the f32 byte premium) but its 6.5 GB transient OOMed
    # the flagship step (16.96 G > 15.75 G hbm).
    D, E_dense = dsplit
    if 0 < D < L:
        wide = d_wide.reshape(n, 2, L, W4)
        idx3 = entry_idx.reshape(n, 2, L)
        rows_d = wide[:, :, :D, :].reshape(n * 2 * D, W4)
        rows_h = wide[:, :, D:, :].reshape(n * 2 * (L - D), W4)
        d_dense = jnp.zeros((E_dense, W4), jnp.float32) \
            .at[idx3[:, :, :D].reshape(-1)].add(rows_d.astype(jnp.float32))
        d_hash = jnp.zeros((E - E_dense, W4), dt) \
            .at[idx3[:, :, D:].reshape(-1) - E_dense].add(rows_h)
        d_table = jnp.concatenate([d_dense.astype(dt), d_hash], axis=0)
    else:
        # all-dense (every entry potentially hot): accumulate f32;
        # all-hashed: the table dtype
        acc_dt = jnp.float32 if D == L else dt
        d_rows = d_wide.reshape(n * 2 * L, W4)
        d_table = jnp.zeros((E, W4), acc_dt) \
            .at[entry_idx.reshape(-1)].add(d_rows.astype(acc_dt)).astype(dt)

    return d_table, d_code, None, d_wy, d_fx, d_fz


_blended_core.defvjp(_blended_vjp_fwd, _blended_vjp_bwd)


def hash_encode_blended_reference(quad_table, x, code, levels,
                                  features_per_logical=2, smoothstep=False):
    """Plain-autodiff formulation (testing oracle for the custom VJP)."""
    Fl = features_per_logical
    L = levels.n_levels
    W4 = quad_table.shape[1]
    W = W4 // _N_QUARTERS
    n = x.shape[0]
    entry_idx, wy, fx, fz = hash_grid_indices(x, levels, smoothstep)
    rows = _gather_rows(quad_table, entry_idx).astype(jnp.float32)
    code_rep = _code_columns(code.astype(jnp.float32), Fl, tile=2 * L)
    w_rep = jnp.repeat(wy, W4, axis=1)
    uw_full = _quad_weights(fx, fz, W, tile=2)
    per_level = _sum_corners(rows * w_rep * uw_full * code_rep)  # [N, L*W4]
    per_level = per_level.reshape(n, L, W4)
    folded = per_level[:, :, :W]
    for q in range(1, _N_QUARTERS):
        folded = folded + per_level[:, :, q * W:(q + 1) * W]  # [N, L, W]
    # sum over logical tables h: [N, L, H, Fl] -> [N, L, Fl]
    H = W // Fl
    return folded.reshape(n, L, H, Fl).sum(axis=2).reshape(n, L * Fl)


def hash_table_param_count(levels: HashGridLevels, row_width: int) -> int:
    return levels.total_entries * row_width
