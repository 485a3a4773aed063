"""Multiresolution hash-grid encoding — TPU-native (XLA gather based).

Replaces tcnn's CUDA HashGrid encoding (reference: hash_ensemble.py:41-52,
nersemble_nerfacto_field.py:127-140). Same structure as Instant-NGP:

- L levels with geometrically growing resolution ``scale_l = base * growth^l``.
- Levels whose dense grid fits in the table are indexed densely; larger levels
  use the Instant-NGP spatial hash (prime-XOR, table size a power of two).
- Trilinear interpolation of the 8 cell corners (optionally smoothstep).

TPU layout design (critical): tiled TPU layouts pad the two minor dims of
every materialized buffer to (8, 128)-multiples, so tensors shaped like
[N, L, 8, F] with tiny minor dims would waste 16-64x HBM. Everything here is
therefore strictly 1-D/2-D with large minor dims:

- index/weight math is done column-wise on [N] vectors per (level, corner) and
  stacked into [N, L*8] matrices (minor dim exactly 128 for L=16);
- tables are stored FLAT [C, E*F] (entry features contiguous) and gathered as
  [N, L*8*F] element blocks — one gather per physical table;
- the corner/packing/blend reductions are expressed as ONE matmul with a
  constant 0/1 selection matrix [L*8*F, L*F_l], which runs on the MXU and
  keeps every intermediate 2-D. The per-timestep ensemble blend is folded in
  as an elementwise multiplier, so the [N, L*F, H] embedding tensor of the
  reference (hash_ensemble.py:112-156) is never materialized.
"""

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


def init_hash_table(rng, levels: HashGridLevels, n_tables: int,
                    features_per_entry: int, dtype=jnp.float32,
                    init_scale: float = 1e-4) -> jnp.ndarray:
    """[C, E * F] flat table, U(-1e-4, 1e-4) like tcnn's HashGrid default.

    Entry e's features occupy the contiguous slice [e*F, (e+1)*F) of row c.
    """
    return jax.random.uniform(
        rng, (n_tables, levels.total_entries * features_per_entry), dtype,
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


@lru_cache(maxsize=8)
def _corner_reduce_matrix(n_levels: int, features_per_entry: int,
                          features_per_logical: int) -> np.ndarray:
    """Constant 0/1 matrix S [L*8*F, L*F_l]: S[j, l*F_l + f] = 1 iff flat
    element j = ((l*8 + corner)*P + p)*F_l + f for some (corner, p).

    ``weighted @ S`` sums gathered elements over corners and packed logical
    tables — the whole trilerp + packing reduction as one MXU matmul.
    """
    L, F, Fl = n_levels, features_per_entry, features_per_logical
    P = F // Fl
    S = np.zeros((L * 8 * F, L * Fl), np.float32)
    for l in range(L):
        for corner in range(8):
            for p in range(P):
                for f in range(Fl):
                    j = ((l * 8 + corner) * F) + p * Fl + f
                    S[j, l * Fl + f] = 1.0
    return S


def _expand_to_elements(entry_idx: jnp.ndarray, F: int) -> jnp.ndarray:
    """[N, L*8] entry indices -> [N, L*8*F] flat element indices
    (each column repeated F times with feature offsets, still 2-D)."""
    base = jnp.repeat(entry_idx * F, F, axis=1)
    offs = jnp.tile(jnp.arange(F, dtype=entry_idx.dtype), entry_idx.shape[1])
    return base + offs[None, :]


def hash_encode(table: jnp.ndarray, x: jnp.ndarray, levels: HashGridLevels,
                features_per_entry: int = 2,
                smoothstep: bool = False) -> jnp.ndarray:
    """Plain encode: table [C, E*F], x [N, 3] -> [N, C * L * F].

    Output layout per table is level-major [L, F] flattened (tcnn layout).
    """
    F = features_per_entry
    entry_idx, weights = hash_grid_indices(x, levels, smoothstep)
    S = jnp.asarray(_corner_reduce_matrix(levels.n_levels, F, F))

    # Rematerialized per-table body: the [N, L*8*F] gathered features (~1 GB at
    # full batch) are recomputed in the backward pass instead of being saved as
    # autodiff residuals — only the [N, L*8] indices/weights persist.
    @jax.checkpoint
    def one_table(table_c, entry_idx, weights):
        elem = _expand_to_elements(entry_idx, F)
        w_rep = jnp.repeat(weights, F, axis=1)
        g = jnp.take(table_c, elem, axis=0).astype(jnp.float32)
        return jnp.dot(g * w_rep, S, preferred_element_type=jnp.float32)

    outs = [one_table(table[c], entry_idx, weights)
            for c in range(table.shape[0])]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def hash_encode_blended(table: jnp.ndarray, x: jnp.ndarray, code: jnp.ndarray,
                        levels: HashGridLevels, features_per_logical: int = 2,
                        features_per_entry: int = 8,
                        smoothstep: bool = False,
                        vmap_tables: bool = False) -> jnp.ndarray:
    """Ensemble encode + per-sample blend: -> [N, L * features_per_logical].

    ``table`` is [C, E*F_phys] (flat); each entry packs P = F_phys/F_l logical
    tables side by side; ``code`` is [N, H] (H = C*P) of already-windowed blend
    weights; logical table h = c*P + p, matching the reference's rearrange +
    einsum (hash_ensemble.py:112, 156):

        out[n, l*Fl+f] = sum_{c,corner,p} w[n,l,corner] * code[n, c*P+p]
                         * table[c, idx[n,l,corner]*F + p*Fl + f]
    """
    F, Fl = features_per_entry, features_per_logical
    P = F // Fl
    C = table.shape[0]
    L = levels.n_levels
    entry_idx, weights = hash_grid_indices(x, levels, smoothstep)
    S = jnp.asarray(_corner_reduce_matrix(L, F, Fl))
    code = code.astype(jnp.float32)

    # Rematerialized per-table body (see hash_encode): keeps only [N, L*8]
    # residuals, recomputing the ~1 GB gathered/expanded tensors in backward.
    @jax.checkpoint
    def one_table(table_c, code_c, entry_idx, weights):
        elem = _expand_to_elements(entry_idx, F)
        w_rep = jnp.repeat(weights, F, axis=1)
        # this table's blend codes expanded to the flat element axis:
        # column j = (l, corner, p, f) -> code[n, c*P + p]
        code_rep = jnp.tile(jnp.repeat(code_c, Fl, axis=1), (1, L * 8))
        g = jnp.take(table_c, elem, axis=0).astype(jnp.float32)
        return jnp.dot(g * w_rep * code_rep, S,
                       preferred_element_type=jnp.float32)

    if vmap_tables:
        # Tensor-parallel form: keep the table axis as a mapped dim so GSPMD
        # can leave each table's gather on its own shard when ``table`` is
        # sharded [C/devices, ...]; the final sum over tables lowers to an
        # all-reduce over ICI (SURVEY.md section 2c's TP design).
        code_per_c = code.reshape(x.shape[0], C, P).transpose(1, 0, 2)
        outs = jax.vmap(one_table, in_axes=(0, 0, None, None))(
            table, code_per_c, entry_idx, weights)
        return jnp.sum(outs, axis=0)

    out = jnp.zeros((x.shape[0], L * Fl), jnp.float32)
    for c in range(C):
        out = out + one_table(table[c], code[:, c * P:(c + 1) * P],
                              entry_idx, weights)
    return out


def hash_table_param_count(levels: HashGridLevels, n_tables: int,
                           features_per_entry: int) -> int:
    return levels.total_entries * n_tables * features_per_entry
