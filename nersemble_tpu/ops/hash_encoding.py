"""Multiresolution hash-grid encoding — TPU-native (z-paired row gathers).

Replaces tcnn's CUDA HashGrid encoding (reference: hash_ensemble.py:41-52,
nersemble_nerfacto_field.py:127-140). Same structure as Instant-NGP:

- L levels with geometrically growing resolution ``scale_l = base * growth^l``.
- Levels whose dense grid fits in the table are indexed densely; larger levels
  use a spatial hash (table size a power of two).
- Trilinear interpolation of the 8 cell corners (optionally smoothstep).

TPU performance design (measured on v5e; history in PERF.md):

1. **Row gathers, not element gathers.** XLA's TPU gather/scatter are per-row
   overhead bound (~tens of millions of rows/s regardless of row width), so
   the number of rows is THE cost. All H logical tables of the ensemble share
   indices, so the whole ensemble is ONE array whose row packs every logical
   table's features (W = H * F_l).
2. **Z-paired rows** (this file's core trick): the index layout is chosen so
   that the z+1 neighbor of any vertex is a FIXED per-level stride away
   (dense levels: z is the fastest axis, stride 1; hashed levels: an additive
   z term, ``idx = (x*p0 ^ y*p1) + z*p2 mod 2^M``, stride p2 mod 2^M — unlike
   tcnn's pure-XOR hash, whose z neighbor is data-dependent). The per-step
   ``build_pair_table`` then packs each entry's own features and its
   z-neighbor's features into one [E, 2W] row (cheap per-level jnp.roll, pure
   contiguous copies), so ONE gathered row serves BOTH z corners of a cell:
   4 gathered rows per (sample, level) instead of 8 — and the backward
   scatter-add rows halve too. For the flagship ensemble (W = 64) the paired
   width 2W = 128 exactly fills the scatter/gather fast-path tile that round 1
   used to fill with dead zero padding.
3. **Tile-layout discipline.** All materialized tensors are 1-D/2-D with a
   large minor dim; corner/table reductions run as matmuls against constant
   0/1 selection matrices on the MXU (built on device from iota comparisons),
   or as corner-major slice-adds. The [N, L*F, H] embedding tensor of the
   reference (hash_ensemble.py:112-156) is never materialized.
4. **Custom VJP** saving only small blend residuals — backward needs NO
   re-gather, and the table gradient rows are built analytically and
   scattered once.
5. **bf16 pair table**: the gathered operand is bf16 (halves gather traffic
   and the pair-table copy); gradients and master params stay f32. The
   reference runs tcnn hash grids in fp16 — same precision class.
6. **Tensor parallelism** = shard the canonical table's FEATURE axis
   [E, W] -> [E, W/devices]; the pair build concatenates along that same
   axis and GSPMD turns the blend matmul's contraction into an all-reduce
   (SURVEY.md section 2c).

Boundary semantics note: at the far z edge of a level (z_floor == res-1,
possible only in the outermost half-cell of the unit cube) the paired row's
"hi" half belongs to a wrapped vertex rather than tcnn's clamped duplicate.
The blend weight of that corner is continuous through 0 at the cell boundary,
so the encoding stays continuous; the outermost half-cell simply trains a
different (still dedicated) parameter than under clamping.
"""

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))
# xy corner order: bit 0 of the corner id selects +1 along x, bit 1 along y
_XY_CORNERS = ((0, 0), (1, 0), (0, 1), (1, 1))


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
    z_strides: Tuple[int, ...]

    @staticmethod
    def create(n_levels: int = 16, log2_hashmap_size: int = 19,
               base_resolution: int = 16,
               per_level_scale: float = 1.4472692012786865) -> "HashGridLevels":
        """Every segment size, offset, and z-stride is a multiple of 8 rows
        (one f32 sublane tile) so the per-level rolls of build_pair_table are
        tile-aligned contiguous copies — measured 211 ms -> ~10 ms on v5e for
        the flagship table when alignment was added."""
        max_size = 2 ** log2_hashmap_size
        mask = max_size - 1
        scales, resolutions, sizes, hashed, offsets, strides = \
            [], [], [], [], [], []
        offset = 0
        for l in range(n_levels):
            scale = base_resolution * per_level_scale ** l
            res = int(np.ceil(scale)) + 1
            # dense layout idx = x + res*y + P*z with the z plane padded to a
            # sublane multiple (so the z-stride P is 8-aligned)
            plane = -(-res * res // 8) * 8
            dense_size = res * plane
            if dense_size <= max_size:
                size, is_hashed, stride = dense_size, False, plane
            else:
                size, is_hashed = max_size, True
                # 8-aligned additive-z hash stride: low 3 bits of the bucket
                # come from the xy hash only; collision structure between
                # distinct (x, y, z) vertices is unchanged (z-only pairs
                # collide iff dz * stride == 0 mod 2^M, i.e. never in-range)
                stride = (int(_PRIMES[2]) & mask) & ~7
            scales.append(float(scale))
            resolutions.append(res)
            sizes.append(size)
            hashed.append(is_hashed)
            offsets.append(offset)
            strides.append(stride)
            offset += size
        return HashGridLevels(n_levels, tuple(scales), tuple(resolutions),
                              tuple(sizes), tuple(hashed), tuple(offsets),
                              offset, log2_hashmap_size, tuple(strides))


def init_hash_table(rng, levels: HashGridLevels, row_width: int,
                    dtype=jnp.float32, init_scale: float = 1e-4) -> jnp.ndarray:
    """[E, W] canonical table, U(-1e-4, 1e-4) like tcnn's HashGrid default.

    Row e packs the features of ALL logical tables at entry e
    (column h * F_l + f = logical table h, feature f).
    """
    return jax.random.uniform(rng, (levels.total_entries, row_width), dtype,
                              -init_scale, init_scale)


def build_pair_table(table: jnp.ndarray, levels: HashGridLevels,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """[E, W] canonical -> [E, 2W] z-paired gather operand.

    Row e = [features(vertex e) | features(z-successor of e)]; the successor
    is ``(e - off_l + stride_l) % size_l + off_l`` — a per-level cyclic roll,
    i.e. pure contiguous copies (HBM-bandwidth bound, ~ms for the flagship
    table). Differentiable: the transpose folds the "hi" gradient half back
    onto the canonical entries with the inverse rolls.
    """
    segs = []
    for l in range(levels.n_levels):
        seg = jax.lax.slice_in_dim(table, levels.offsets[l],
                                   levels.offsets[l] + levels.sizes[l], axis=0)
        stride = levels.z_strides[l] % levels.sizes[l]
        segs.append(jnp.roll(seg, -stride, axis=0))
    succ = jnp.concatenate(segs, axis=0)
    return jnp.concatenate([table, succ], axis=1).astype(dtype)


def hash_grid_indices(x: jnp.ndarray, levels: HashGridLevels,
                      smoothstep: bool = False):
    """Corner indices and interpolation weights for [N, 3] positions in [0,1].

    Returns (entry_idx [N, 4L] int32, wxy [N, 4L] f32, fz [N, L] f32) in
    CORNER-MAJOR column order: column c * L + l is xy-corner c of level l.
    ``wxy`` are the bilinear xy weights, ``fz`` the z interpolation fraction;
    both are differentiable w.r.t. ``x`` — that is how gradients reach the
    deformation field through the encoding.

    All math is done on [N] columns and stacked once, so no intermediate has
    a tiny minor dimension (TPU tile-padding safety).
    """
    px_all = [x[:, 0], x[:, 1], x[:, 2]]
    mask = np.uint32(2 ** levels.log2_hashmap_size - 1)

    idx_cols = [[] for _ in _XY_CORNERS]
    w_cols = [[] for _ in _XY_CORNERS]
    fz_cols = []
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
        cz = jnp.clip(grid[2], 0, res - 1)
        fz_cols.append(frac[2])
        for c, (ci, cj) in enumerate(_XY_CORNERS):
            cx = jnp.clip(grid[0] + ci, 0, res - 1)
            cy = jnp.clip(grid[1] + cj, 0, res - 1)
            stride = np.uint32(levels.z_strides[l])
            if levels.hashed[l]:
                h = ((cx.astype(jnp.uint32) * _PRIMES[0]
                      ^ cy.astype(jnp.uint32) * _PRIMES[1])
                     + cz.astype(jnp.uint32) * stride)
                idx = (h & mask).astype(jnp.int32)
            else:
                idx = cx + res * cy + levels.z_strides[l] * cz
            idx_cols[c].append(idx + levels.offsets[l])
            w_cols[c].append((frac[0] if ci else 1.0 - frac[0])
                             * (frac[1] if cj else 1.0 - frac[1]))
    flat_idx = [col for group in idx_cols for col in group]
    flat_w = [col for group in w_cols for col in group]
    entry_idx = jnp.stack(flat_idx, axis=1)
    wxy = jnp.stack(flat_w, axis=1)
    fz = jnp.stack(fz_cols, axis=1)
    return entry_idx, wxy, fz


def _gather_rows(table: jnp.ndarray, entry_idx: jnp.ndarray) -> jnp.ndarray:
    """[E, W2] x [N, K] -> [N, K*W2] flat gathered rows (ONE row gather)."""
    n, k = entry_idx.shape
    rows = jnp.take(table, entry_idx.reshape(-1), axis=0)  # [N*K, W2]
    return rows.reshape(n, k * table.shape[1])


# --------------------------------------------------------------------------
# column-pattern expansion helpers (2-D/clean-3-D only; see docstring point 3)
# --------------------------------------------------------------------------

def _z_weights(fz: jnp.ndarray, width: int, tile: int) -> jnp.ndarray:
    """fz [N, L] -> [N, tile * L * 2 * width] with per-level pattern
    [(1 - fz_l) * width, fz_l * width], tiled ``tile`` times (corner-major)."""
    n, L = fz.shape
    s = jnp.stack([1.0 - fz, fz], axis=2).reshape(n, 2 * L)
    s = jnp.repeat(s, width, axis=1)  # [N, L * 2 * width]
    return jnp.tile(s, (1, tile)) if tile > 1 else s


def _expand_gbar(gbar: jnp.ndarray, Fl: int, width: int, tile: int):
    """gbar [N, L*Fl] -> [N, tile * L * width] where column (l, k) carries
    gbar[l, k % Fl] (k in [0, width)), tiled corner-major."""
    n, LFl = gbar.shape
    L = LFl // Fl
    g = jnp.tile(gbar.reshape(n, L, Fl), (1, 1, width // Fl)).reshape(n, L * width)
    return jnp.tile(g, (1, tile)) if tile > 1 else g


def _code_columns(code: jnp.ndarray, Fl: int, tile: int) -> jnp.ndarray:
    """code [N, H] -> [N, tile * 2 * H * Fl]: the per-column logical-table
    multiplier over one paired row [lo | hi], tiled corner-major."""
    c = jnp.repeat(code, Fl, axis=1)  # [N, W]
    c = jnp.tile(c, (1, 2))  # [N, W2]
    return jnp.tile(c, (1, tile)) if tile > 1 else c


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _sel(cond, dtype=jnp.float32):
    return cond.astype(dtype)


def _sum_corners(x: jnp.ndarray, n_corners: int = 4) -> jnp.ndarray:
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

def hash_encode(pair_table: jnp.ndarray, x: jnp.ndarray,
                levels: HashGridLevels, smoothstep: bool = False) -> jnp.ndarray:
    """Plain encode: pair table [E, 2W], x [N, 3] -> [N, L * W].

    Output layout is level-major [L, W] flattened; for a single-grid field
    (W = features_per_level) this is exactly the tcnn layout.
    """
    W2 = pair_table.shape[1]
    W = W2 // 2
    L = levels.n_levels
    entry_idx, wxy, fz = hash_grid_indices(x, levels, smoothstep)
    n = x.shape[0]

    @jax.checkpoint
    def body(pair_table, entry_idx, wxy, fz):
        rows = _gather_rows(pair_table, entry_idx).astype(jnp.float32)
        w_rep = jnp.repeat(wxy, W2, axis=1)
        zw = _z_weights(fz, W, tile=4)
        per_level = _sum_corners(rows * w_rep * zw)  # [N, L*W2]
        # fold the z pair: lo half + hi half per level
        per_level = per_level.reshape(n, L, W2)
        return (per_level[:, :, :W] + per_level[:, :, W:]).reshape(n, L * W)

    return body(pair_table, entry_idx, wxy, fz)


# --------------------------------------------------------------------------
# blended encode (hash ensemble) — custom VJP, no backward re-gather
# --------------------------------------------------------------------------

def hash_encode_blended(pair_table: jnp.ndarray, x: jnp.ndarray,
                        code: jnp.ndarray, levels: HashGridLevels,
                        features_per_logical: int = 2,
                        smoothstep: bool = False) -> jnp.ndarray:
    """Ensemble encode + per-sample blend: -> [N, L * features_per_logical].

    ``pair_table`` is [E, 2W] with W = H * F_l (H logical tables packed per
    row); ``code`` is [N, H] of already-windowed blend weights. Matches the
    reference's rearrange + einsum (hash_ensemble.py:112, 156):

        out[n, l*Fl+f] = sum_{corner,h} w[n,l,corner] * code[n,h]
                         * table[idx[n,l,corner], h*Fl + f]

    Custom VJP: the backward pass needs NO re-gather. The forward saves two
    blend residuals —
        CG[n, (c,l), half, f] = sum_h code_h * rows      (code-blended halves)
        B [n, l, k]           = sum_c wxy * zw * rows    (weight-blended rows)
    — from which every gradient follows analytically:
        d rows[(c,l), k] = wxy * zw_k * code_h(k) * gbar[l, f(k)]  (scatter)
        d wxy[(c,l)]     = sum_f gbar[l,f] * ((1-fz) CG_lo + fz CG_hi)
        d fz[l]          = sum_{c,f} wxy * gbar[l,f] * (CG_hi - CG_lo)
        d code[h]        = sum_{l,k: h(k)=h} gbar[l, f(k)] * B[l, k]
    """
    entry_idx, wxy, fz = hash_grid_indices(x, levels, smoothstep)
    return _blended_core(pair_table, code.astype(jnp.float32), entry_idx,
                         wxy, fz, levels.n_levels, features_per_logical)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _blended_core(pair_table, code, entry_idx, wxy, fz, L, Fl):
    out, _ = _blended_fwd_impl(pair_table, code, entry_idx, wxy, fz, L, Fl)
    return out


def _s_cg(L, W2, Fl, dtype):
    """[4L*W2, 4L*2Fl] 0/1: column j = (cl)*W2 + k maps to
    m = (cl)*2Fl + (k // W)*Fl + (k % W) % Fl (sum over logical tables h)."""
    W = W2 // 2
    j = _iota2((4 * L * W2, 4 * L * 2 * Fl), 0)
    m = _iota2((4 * L * W2, 4 * L * 2 * Fl), 1)
    k = j % W2
    return _sel((j // W2 == m // (2 * Fl))
                & (k // W == (m % (2 * Fl)) // Fl)
                & ((k % W) % Fl == m % Fl), dtype)


def _s_half(L, Fl):
    """[4L*2Fl, 4L*Fl] 0/1: sum the lo/hi halves per (corner, level, f)."""
    j = _iota2((4 * L * 2 * Fl, 4 * L * Fl), 0)
    m = _iota2((4 * L * 2 * Fl, 4 * L * Fl), 1)
    return _sel((j // (2 * Fl) == m // Fl) & (j % Fl == m % Fl))


def _blended_fwd_impl(pair_table, code, entry_idx, wxy, fz, L, Fl):
    W2 = pair_table.shape[1]
    W = W2 // 2
    n = code.shape[0]

    rows = _gather_rows(pair_table, entry_idx)  # [N, 4L*W2] (bf16 usually)
    # blend matmuls run in the pair table's dtype (bf16 in production,
    # f32 in exactness tests), always accumulating f32 on the MXU
    mm_dtype = rows.dtype
    code_rep = _code_columns(code, Fl, tile=4 * L)
    # CG[n, (cl)*2Fl + half*Fl + f] = sum_h code * rows
    cg_in = rows * code_rep.astype(mm_dtype)
    CG = jnp.dot(cg_in, _s_cg(L, W2, Fl, mm_dtype),
                 preferred_element_type=jnp.float32)  # [N, 4L*2Fl]

    zw_fl = _z_weights(fz, Fl, tile=4)  # [N, 4L*2Fl]
    G = jnp.dot(CG * zw_fl, _s_half(L, Fl),
                preferred_element_type=jnp.float32)  # [N, 4L*Fl]
    w_fl = jnp.repeat(wxy, Fl, axis=1)  # [N, 4L*Fl]
    out = _sum_corners(G * w_fl)  # [N, L*Fl]

    # B[n, l*W2 + k] = sum_c wxy * zw * rows (for d_code); stored in the
    # table dtype (bf16 residual in production)
    w_rep = jnp.repeat(wxy, W2, axis=1)
    zw_full = _z_weights(fz, W, tile=4)
    B = _sum_corners(rows.astype(jnp.float32) * w_rep * zw_full)
    return out, (CG, B.astype(mm_dtype))


def _blended_vjp_fwd(pair_table, code, entry_idx, wxy, fz, L, Fl):
    out, (CG, B) = _blended_fwd_impl(pair_table, code, entry_idx, wxy, fz,
                                     L, Fl)
    return out, (CG, B, code, entry_idx, wxy, fz, pair_table.shape)


def _blended_vjp_bwd(L, Fl, residuals, gbar):
    CG, B, code, entry_idx, wxy, fz, table_shape = residuals
    E, W2 = table_shape
    W = W2 // 2
    n = code.shape[0]
    H = code.shape[1]
    gbar = gbar.astype(jnp.float32)  # [N, L*Fl]

    g_half = _expand_gbar(gbar, Fl, 2 * Fl, tile=4)  # [N, 4L*2Fl]
    zw_fl = _z_weights(fz, Fl, tile=4)

    # d wxy: sum over (half, f) of CG * zw * gbar -> [N, 4L]
    j = _iota2((4 * L * 2 * Fl, 4 * L), 0)
    m = _iota2((4 * L * 2 * Fl, 4 * L), 1)
    s_w = _sel(j // (2 * Fl) == m)
    d_wxy = jnp.dot(CG * zw_fl * g_half, s_w,
                    preferred_element_type=jnp.float32)

    # d fz: signed sum over (c, half, f) of wxy * CG * gbar -> [N, L]
    w_2fl = jnp.repeat(wxy, 2 * Fl, axis=1)  # [N, 4L*2Fl]
    j = _iota2((4 * L * 2 * Fl, L), 0)
    m = _iota2((4 * L * 2 * Fl, L), 1)
    sign = jnp.where((j % (2 * Fl)) // Fl == 1, 1.0, -1.0)
    s_fz = _sel((j // (2 * Fl)) % L == m) * sign
    d_fz = jnp.dot(CG * w_2fl * g_half, s_fz,
                   preferred_element_type=jnp.float32)

    # d code: sum over (l, k: h(k)=h) of B * zw-free... B already carries
    # wxy and zw, so d_code[h] = sum gbar[l, f(k)] * B[l, k]
    gb = _expand_gbar(gbar, Fl, W2, tile=1)  # [N, L*W2]
    j = _iota2((L * W2, H), 0)
    m = _iota2((L * W2, H), 1)
    s_c = _sel(((j % W2) % W) // Fl == m, B.dtype)
    d_code = jnp.dot(B * gb.astype(B.dtype), s_c,
                     preferred_element_type=jnp.float32)

    # d table rows: analytic, then ONE scatter-add
    g_rows = _expand_gbar(gbar, Fl, W2, tile=4)  # [N, 4L*W2]
    code_rep = _code_columns(code, Fl, tile=4 * L)
    w_rep = jnp.repeat(wxy, W2, axis=1)
    zw_full = _z_weights(fz, W, tile=4)
    d_rows = (g_rows * w_rep * zw_full * code_rep).reshape(n * 4 * L, W2)
    # accumulate in f32, then cast to the pair table's dtype (== B.dtype)
    d_table = jnp.zeros((E, W2), jnp.float32) \
        .at[entry_idx.reshape(-1)].add(d_rows)
    d_table = d_table.astype(B.dtype)

    return d_table, d_code, None, d_wxy, d_fz


_blended_core.defvjp(_blended_vjp_fwd, _blended_vjp_bwd)


def hash_encode_blended_reference(pair_table, x, code, levels,
                                  features_per_logical=2, smoothstep=False):
    """Plain-autodiff formulation (testing oracle for the custom VJP)."""
    Fl = features_per_logical
    L = levels.n_levels
    W2 = pair_table.shape[1]
    W = W2 // 2
    n = x.shape[0]
    entry_idx, wxy, fz = hash_grid_indices(x, levels, smoothstep)
    rows = _gather_rows(pair_table, entry_idx).astype(jnp.float32)
    code_rep = _code_columns(code.astype(jnp.float32), Fl, tile=4 * L)
    w_rep = jnp.repeat(wxy, W2, axis=1)
    zw_full = _z_weights(fz, W, tile=4)
    per_level = _sum_corners(rows * w_rep * zw_full * code_rep)  # [N, L*W2]
    per_level = per_level.reshape(n, L, W2)
    paired = (per_level[:, :, :W] + per_level[:, :, W:])  # [N, L, W]
    # sum over logical tables h: [N, L, H, Fl] -> [N, L, Fl]
    H = W // Fl
    return paired.reshape(n, L, H, Fl).sum(axis=2).reshape(n, L * Fl)


def hash_table_param_count(levels: HashGridLevels, row_width: int) -> int:
    return levels.total_entries * row_width
