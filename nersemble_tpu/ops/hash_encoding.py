"""Multiresolution hash-grid encoding — TPU-native (row-gather based).

Replaces tcnn's CUDA HashGrid encoding (reference: hash_ensemble.py:41-52,
nersemble_nerfacto_field.py:127-140). Same structure as Instant-NGP:

- L levels with geometrically growing resolution ``scale_l = base * growth^l``.
- Levels whose dense grid fits in the table are indexed densely; larger levels
  use the Instant-NGP spatial hash (prime-XOR, table size a power of two).
- Trilinear interpolation of the 8 cell corners (optionally smoothstep).

TPU performance design (measured on v5e):

1. **Row gathers, not element gathers.** XLA's TPU gather is per-row overhead
   bound (~tens of millions of rows/s regardless of row width), so the number
   of gathered rows is THE cost. All H logical tables of the ensemble use the
   same hash function and positions — only their contents differ — so the
   whole ensemble is ONE array [E, W] whose row packs every logical table's
   features (W = H * F_l, logical-table-major: column h*F_l + f). One gather
   serves all tables: 8x fewer rows than per-table storage.
2. **Tile-layout discipline.** All materialized tensors are 1-D/2-D with a
   large minor dim (TPU pads the two minor dims to (8, 128) tiles): index
   math is column-wise stacked to [N, L*8]; gathered rows flatten to
   [N, L*8*W]; the corner/blend reductions run as ONE matmul against a
   constant 0/1 selection matrix on the MXU. The [N, L*F, H] embedding tensor
   of the reference (hash_ensemble.py:112-156) is never materialized.
3. **Rematerialization.** The gather body is ``jax.checkpoint``-ed so backward
   recomputes the row tensor instead of saving it per chunk.
4. **Tensor parallelism** = shard the table's FEATURE axis [E, W] ->
   [E, W/devices]: gathers stay local per shard and GSPMD turns the blend
   matmul's contraction into an all-reduce (SURVEY.md section 2c).
"""

import functools
from dataclasses import dataclass
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))
# corner order: bit b of the corner id selects the +1 offset along dim b
_CORNERS = [(i, j, k) for k in (0, 1) for j in (0, 1) for i in (0, 1)]


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

    @staticmethod
    def create(n_levels: int = 16, log2_hashmap_size: int = 19,
               base_resolution: int = 16,
               per_level_scale: float = 1.4472692012786865) -> "HashGridLevels":
        max_size = 2 ** log2_hashmap_size
        scales, resolutions, sizes, hashed, offsets = [], [], [], [], []
        offset = 0
        for l in range(n_levels):
            scale = base_resolution * per_level_scale ** l
            res = int(np.ceil(scale)) + 1
            dense_size = res ** 3
            if dense_size <= max_size:
                size, is_hashed = dense_size, False
            else:
                size, is_hashed = max_size, True
            scales.append(float(scale))
            resolutions.append(res)
            sizes.append(size)
            hashed.append(is_hashed)
            offsets.append(offset)
            offset += size
        return HashGridLevels(n_levels, tuple(scales), tuple(resolutions),
                              tuple(sizes), tuple(hashed), tuple(offsets),
                              offset, log2_hashmap_size)


def init_hash_table(rng, levels: HashGridLevels, row_width: int,
                    dtype=jnp.float32, init_scale: float = 1e-4) -> jnp.ndarray:
    """[E, W] table, U(-1e-4, 1e-4) like tcnn's HashGrid default.

    Row e packs the features of ALL logical tables at entry e
    (column h * F_l + f = logical table h, feature f).
    """
    return jax.random.uniform(rng, (levels.total_entries, row_width), dtype,
                              -init_scale, init_scale)


def hash_grid_indices(x: jnp.ndarray, levels: HashGridLevels,
                      smoothstep: bool = False):
    """Corner indices and interpolation weights for [N, 3] positions in [0,1].

    Returns (entry_idx [N, L*8] int32 into the E axis, weights [N, L*8] f32).
    Column (l, corner) = l * 8 + corner. Weights are differentiable w.r.t.
    ``x`` (piecewise-trilinear) — that is how gradients reach the deformation
    field through the encoding.

    All math is done on [N] columns and stacked once, so no intermediate has a
    tiny minor dimension (TPU tile-padding safety).
    """
    px_all = [x[:, 0], x[:, 1], x[:, 2]]
    mask = np.uint32(2 ** levels.log2_hashmap_size - 1)

    idx_cols = []
    w_cols = []
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
        for (ci, cj, ck) in _CORNERS:
            cc = [jnp.clip(grid[d] + o, 0, res - 1)
                  for d, o in enumerate((ci, cj, ck))]
            if levels.hashed[l]:
                h = (cc[0].astype(jnp.uint32) * _PRIMES[0]
                     ^ cc[1].astype(jnp.uint32) * _PRIMES[1]
                     ^ cc[2].astype(jnp.uint32) * _PRIMES[2])
                idx = (h & mask).astype(jnp.int32)
            else:
                idx = cc[0] + res * (cc[1] + res * cc[2])
            idx_cols.append(idx + levels.offsets[l])
            w = ((frac[0] if ci else 1.0 - frac[0])
                 * (frac[1] if cj else 1.0 - frac[1])
                 * (frac[2] if ck else 1.0 - frac[2]))
            w_cols.append(w)
    entry_idx = jnp.stack(idx_cols, axis=1)
    weights = jnp.stack(w_cols, axis=1)
    return entry_idx, weights


def padded_row_width(real_width: int) -> int:
    """Physical row width for the [E, W] table.

    Measured on v5e: XLA scatter-add (the gradient path) runs ~8x faster when
    update rows are wider than 64 elements (a full 128-lane tile row), and
    gathers speed up too. Rows with >= 64 real features are padded to 128;
    the pad columns are dead (zero in the selection matrix, zero gradients).
    """
    return 128 if real_width >= 64 else real_width


@lru_cache(maxsize=16)
def _corner_reduce_matrix(n_levels: int, row_width: int, real_width: int,
                          out_per_level: int) -> np.ndarray:
    """Constant 0/1 matrix S [L*8*W, L*out]: S[j, l*out + o] = 1 iff flat
    element j = (l*8 + corner)*W + k for some corner with k < real_width,
    o = k % out. Pad columns (k >= real_width) map to nothing.

    For the plain encode out == real_width (identity over the row); for the
    blended encode out == F_l and column k = h*F_l + f maps to output f.
    ``weighted @ S`` sums gathered elements over corners (and, blended,
    logical tables) — the whole trilerp + blend reduction as one MXU matmul.
    """
    L, W, out = n_levels, row_width, out_per_level
    S = np.zeros((L * 8 * W, L * out), np.float32)
    for l in range(L):
        for corner in range(8):
            for k in range(real_width):
                j = (l * 8 + corner) * W + k
                S[j, l * out + (k % out)] = 1.0
    return S


def _gather_rows(table: jnp.ndarray, entry_idx: jnp.ndarray) -> jnp.ndarray:
    """[E, W] x [N, K] -> [N, K*W] flat gathered rows (ONE row gather)."""
    n, k = entry_idx.shape
    rows = jnp.take(table, entry_idx.reshape(-1), axis=0)  # [N*K, W]
    return rows.reshape(n, k * table.shape[1])


def hash_encode(table: jnp.ndarray, x: jnp.ndarray, levels: HashGridLevels,
                smoothstep: bool = False,
                real_width: int = None) -> jnp.ndarray:
    """Plain encode: table [E, W], x [N, 3] -> [N, L * real_width].

    Output layout is level-major [L, real_width] flattened; for a single-grid
    field (real_width = features_per_level) this is exactly the tcnn layout.
    """
    W = table.shape[1]
    real_width = real_width or W
    entry_idx, weights = hash_grid_indices(x, levels, smoothstep)
    S = jnp.asarray(_corner_reduce_matrix(levels.n_levels, W, real_width,
                                          real_width))

    @jax.checkpoint
    def body(table, entry_idx, weights):
        rows = _gather_rows(table, entry_idx).astype(jnp.float32)
        w_rep = jnp.repeat(weights, W, axis=1)
        return jnp.dot(rows * w_rep, S, preferred_element_type=jnp.float32)

    return body(table, entry_idx, weights)


def _expand_code(code, Fl, W, L8):
    """[N, H] blend code -> [N, L8*W] multiplier over the flat row layout
    (zero in pad columns)."""
    real_width = code.shape[1] * Fl
    code_row = jnp.repeat(code, Fl, axis=1)  # [N, real_width]
    if W > real_width:
        code_row = jnp.pad(code_row, ((0, 0), (0, W - real_width)))
    return jnp.tile(code_row, (1, L8))


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _sel(cond):
    return cond.astype(jnp.float32)


def _blend_matrices(L, W, Fl, H):
    """Device-built 0/1 selection matrices for the blended encode VJP
    (constructed from iota comparisons so no multi-MB literals are shipped to
    the remote compiler). Row layout: j = (l*8 + corner)*W + h*Fl + f, with
    pad columns h*Fl + f >= H*Fl mapping to nothing."""
    L8, K, Wr = L * 8, L * 8 * W, H * Fl

    j_k = _iota2((K, L8 * Fl), 0)
    m_k = _iota2((K, L8 * Fl), 1)
    # S_G [K, L8*Fl]: sum over h -> per-corner, per-feature
    s_g = _sel((j_k // W == m_k // Fl) & (j_k % W < Wr)
               & ((j_k % W) % Fl == m_k % Fl))

    j_o = _iota2((L8 * Fl, L * Fl), 0)
    m_o = _iota2((L8 * Fl, L * Fl), 1)
    # S_O [L8*Fl, L*Fl]: sum over corners
    s_o = _sel((j_o // (8 * Fl) == m_o // Fl) & (j_o % Fl == m_o % Fl))
    return s_g, s_o


def hash_encode_blended(table: jnp.ndarray, x: jnp.ndarray, code: jnp.ndarray,
                        levels: HashGridLevels, features_per_logical: int = 2,
                        smoothstep: bool = False) -> jnp.ndarray:
    """Ensemble encode + per-sample blend: -> [N, L * features_per_logical].

    ``table`` is [E, W] with W = H * F_l (H logical tables packed per row,
    optionally padded); ``code`` is [N, H] of already-windowed blend weights.
    Matches the reference's rearrange + einsum (hash_ensemble.py:112, 156):

        out[n, l*Fl+f] = sum_{corner,h} w[n,l,corner] * code[n,h]
                         * table[idx[n,l,corner], h*Fl + f]

    Uses a custom VJP (see _blended_core) so the backward pass needs NO
    re-gather: instead of the [N, L*8*W] row tensor, only two small blend
    residuals are saved —
        G[n, lc, f] = sum_h code*rows   (per-corner code-blend) and
        B[n, l, w]  = sum_c w*rows      (per-level weight-blend, bf16) —
    from which every gradient follows analytically:
        d rows[lc, hf] = w_lc * code_h * gbar[l, f]      (the scatter values)
        d w_lc         = sum_f gbar[l, f] * G[lc, f]     (-> positions)
        d code_h       = sum_{l,f} gbar[l, f] * B[l, hf]
    """
    entry_idx, weights = hash_grid_indices(x, levels, smoothstep)
    return _blended_core(table, code.astype(jnp.float32), entry_idx, weights,
                         levels.n_levels, features_per_logical)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _blended_core(table, code, entry_idx, weights, L, Fl):
    out, _ = _blended_fwd_impl(table, code, entry_idx, weights, L, Fl)
    return out


def _blended_fwd_impl(table, code, entry_idx, weights, L, Fl):
    W = table.shape[1]
    N = code.shape[0]
    L8 = L * 8
    s_g, s_o = _blend_matrices(L, W, Fl, code.shape[1])

    rows = _gather_rows(table, entry_idx).astype(jnp.float32)  # [N, L8*W]
    code_rep = _expand_code(code, Fl, W, L8)
    w_rep = jnp.repeat(weights, W, axis=1)

    G = jnp.dot(rows * code_rep, s_g, preferred_element_type=jnp.float32)
    # B[n, l*Wr + w] = sum_corner weights * rows: reshape-sum (minor pair
    # (8, W>=128) -> no tile padding); pad columns dropped, stored bf16
    Wr = code.shape[1] * Fl
    B = (rows * w_rep).reshape(N, L, 8, W).sum(axis=2)[:, :, :Wr]
    B = B.reshape(N, L * Wr)
    w_fl = jnp.repeat(weights, Fl, axis=1)  # [N, L8*Fl]
    out = jnp.dot(G * w_fl, s_o, preferred_element_type=jnp.float32)
    return out, (G, B.astype(jnp.bfloat16))


def _blended_vjp_fwd(table, code, entry_idx, weights, L, Fl):
    out, (G, B) = _blended_fwd_impl(table, code, entry_idx, weights, L, Fl)
    return out, (G, B, code, entry_idx, weights, table.shape)


def _blended_vjp_bwd(L, Fl, residuals, gbar):
    G, B, code, entry_idx, weights, table_shape = residuals
    E, W = table_shape
    N = code.shape[0]
    H = code.shape[1]
    L8 = L * 8
    gbar = gbar.astype(jnp.float32)  # [N, L*Fl]

    # expand gbar over corners: [N, L8*Fl]
    j = _iota2((L * Fl, L8 * Fl), 0)
    m = _iota2((L * Fl, L8 * Fl), 1)
    t_cf = _sel((j // Fl == m // (8 * Fl)) & (j % Fl == m % Fl))
    g_corner = jnp.dot(gbar, t_cf, preferred_element_type=jnp.float32)

    # d weights: sum over f of G * g_corner -> [N, L8]
    j = _iota2((L8 * Fl, L8), 0)
    m = _iota2((L8 * Fl, L8), 1)
    s_w = _sel(j // Fl == m)
    d_weights = jnp.dot(G * g_corner, s_w, preferred_element_type=jnp.float32)

    # d code: sum over (l, f) of B * gbar-expanded -> [N, H]
    # (B layout is pad-free: [N, L*Wr] with Wr = H*Fl)
    Wr = H * Fl
    j = _iota2((L * Fl, L * Wr), 0)
    m = _iota2((L * Fl, L * Wr), 1)
    t_b = _sel((j // Fl == m // Wr) & ((m % Wr) % Fl == j % Fl))
    g_b = jnp.dot(gbar, t_b, preferred_element_type=jnp.float32)  # [N, L*Wr]
    j = _iota2((L * Wr, H), 0)
    m = _iota2((L * Wr, H), 1)
    s_c = _sel((j % Wr) // Fl == m)
    d_code = jnp.dot(B.astype(jnp.float32) * g_b, s_c,
                     preferred_element_type=jnp.float32)

    # d table: scatter the analytically-built gradient rows
    j = _iota2((L * Fl, L8 * W), 0)
    m = _iota2((L * Fl, L8 * W), 1)
    t_r = _sel((j // Fl == m // (8 * W)) & ((m % W) % Fl == j % Fl)
               & (m % W < H * Fl))
    g_rows = jnp.dot(gbar, t_r, preferred_element_type=jnp.float32)  # [N, L8*W]
    code_rep = _expand_code(code, Fl, W, L8)
    w_rep = jnp.repeat(weights, W, axis=1)
    d_rows = (g_rows * w_rep * code_rep).reshape(N * L8, W)
    d_table = jnp.zeros((E, W), jnp.float32).at[entry_idx.reshape(-1)].add(d_rows)

    return d_table, d_code, None, d_weights


_blended_core.defvjp(_blended_vjp_fwd, _blended_vjp_bwd)


def hash_encode_blended_reference(table, x, code, levels,
                                  features_per_logical=2, smoothstep=False):
    """Plain-autodiff formulation (testing oracle for the custom VJP)."""
    W = table.shape[1]
    Fl = features_per_logical
    L = levels.n_levels
    real_width = code.shape[1] * Fl
    entry_idx, weights = hash_grid_indices(x, levels, smoothstep)
    S = jnp.asarray(_corner_reduce_matrix(L, W, real_width, Fl))
    code_rep = _expand_code(code.astype(jnp.float32), Fl, W, L * 8)
    rows = _gather_rows(table, entry_idx).astype(jnp.float32)
    w_rep = jnp.repeat(weights, W, axis=1)
    return jnp.dot(rows * w_rep * code_rep, S,
                   preferred_element_type=jnp.float32)


def hash_table_param_count(levels: HashGridLevels, row_width: int) -> int:
    return levels.total_entries * row_width
