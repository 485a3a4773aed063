"""Multiresolution hash-grid encoding — TPU-native (XLA gather based).

Replaces tcnn's CUDA HashGrid encoding (reference: hash_ensemble.py:41-52,
nersemble_nerfacto_field.py:127-140). Same structure as Instant-NGP:

- L levels with geometrically growing resolution ``scale_l = base * growth^l``.
- Levels whose dense grid fits in the table are indexed densely; larger levels
  use the Instant-NGP spatial hash (prime-XOR, table size a power of two).
- Trilinear interpolation of the 8 cell corners (optionally smoothstep).

Design for TPU: all levels are processed in one vectorized computation and the
8 corners are a static unrolled loop, so each corner issues ONE flat gather
``table[C, E, F] -> [C, N, L, F]`` (XLA lowers this to an efficient dynamic
gather; the backward is the matching scatter-add). The per-timestep ensemble
blend is folded into the corner loop so the [N, L*F, H] tensor of the reference
(hash_ensemble.py:112-156) is never materialized.

Packing mirrors the reference trick (hash_ensemble.py:41-52, 79-87): H logical
tables of F_l features ride in C = H*F_l/8 physical tables of 8 features, so a
physical entry holds P = 8/F_l logical tables side by side.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)
_CORNERS = np.array([[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
                    dtype=np.int32)  # [8, 3]


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
    """[C, E, F] table, U(-1e-4, 1e-4) like tcnn's HashGrid default."""
    return jax.random.uniform(
        rng, (n_tables, levels.total_entries, features_per_entry), dtype,
        -init_scale, init_scale)


def hash_grid_indices(x: jnp.ndarray, levels: HashGridLevels,
                      smoothstep: bool = False):
    """Corner indices and interpolation weights for [N, 3] positions in [0,1].

    Returns (flat_idx [N, L, 8] int32 into the E axis, weights [N, L, 8] f32).
    Weights are differentiable w.r.t. ``x`` (piecewise-(tri)linear), which is
    how gradients reach the deformation field through the encoding.
    """
    L = levels.n_levels
    scales = jnp.asarray(levels.scales, jnp.float32)
    res = jnp.asarray(levels.resolutions, jnp.int32)
    hashed = jnp.asarray(levels.hashed, jnp.bool_)
    offsets = jnp.asarray(levels.offsets, jnp.int32)
    mask = jnp.uint32(2 ** levels.log2_hashmap_size - 1)

    pos = x[:, None, :] * scales[None, :, None] + 0.5  # [N, L, 3]
    grid = jnp.floor(pos)
    frac = pos - grid  # in [0, 1)
    if smoothstep:
        frac = frac * frac * (3.0 - 2.0 * frac)
    grid = grid.astype(jnp.int32)

    corners = jnp.asarray(_CORNERS)  # [8, 3]
    cc = grid[:, :, None, :] + corners[None, None, :, :]  # [N, L, 8, 3]
    cc = jnp.minimum(cc, (res - 1)[None, :, None, None])
    cc = jnp.maximum(cc, 0)

    res_b = res[None, :, None]
    dense_idx = cc[..., 0] + res_b * (cc[..., 1] + res_b * cc[..., 2])

    ccu = cc.astype(jnp.uint32)
    hash_idx = (ccu[..., 0] * _PRIMES[0]) ^ (ccu[..., 1] * _PRIMES[1]) \
        ^ (ccu[..., 2] * _PRIMES[2])
    hash_idx = (hash_idx & mask).astype(jnp.int32)

    idx = jnp.where(hashed[None, :, None], hash_idx, dense_idx)
    flat_idx = idx + offsets[None, :, None]

    # trilinear corner weights: prod_d (corner_d ? frac : 1 - frac)
    w = jnp.where(corners[None, None, :, :] == 1, frac[:, :, None, :],
                  1.0 - frac[:, :, None, :])
    weights = w[..., 0] * w[..., 1] * w[..., 2]  # [N, L, 8]
    return flat_idx, weights


def hash_encode(table: jnp.ndarray, x: jnp.ndarray, levels: HashGridLevels,
                smoothstep: bool = False) -> jnp.ndarray:
    """Single-table encode: table [1 or C, E, F], x [N, 3] -> [N, C * L * F].

    Output layout per table is level-major: [L, F] flattened (tcnn layout).
    """
    flat_idx, weights = hash_grid_indices(x, levels, smoothstep)
    C = table.shape[0]
    N, L = x.shape[0], levels.n_levels
    F = table.shape[-1]
    out = jnp.zeros((C, N, L, F), jnp.float32)
    for corner in range(8):
        g = jnp.take(table, flat_idx[:, :, corner], axis=1)  # [C, N, L, F]
        out = out + weights[None, :, :, corner, None] * g.astype(jnp.float32)
    return jnp.moveaxis(out, 0, 1).reshape(N, C * L * F)


def hash_encode_blended(table: jnp.ndarray, x: jnp.ndarray, code: jnp.ndarray,
                        levels: HashGridLevels, features_per_logical: int = 2,
                        smoothstep: bool = False) -> jnp.ndarray:
    """Ensemble encode + per-sample blend: -> [N, L * features_per_logical].

    ``table`` is [C, E, F_phys]; entry features pack P = F_phys /
    features_per_logical logical tables side by side. ``code`` is [N, H] with
    H = C * P — the (already windowed) per-sample blend weights. Logical table
    h = c * P + p, matching the reference's einops rearrange + einsum
    (hash_ensemble.py:112, 156).

    The blend is folded into the 8-corner loop:
        out[n,l,f] = sum_corner w[n,l,corner] *
                     sum_{c,p} code[n, c*P+p] * table[c, idx[n,l,corner], p*Fl+f]
    """
    flat_idx, weights = hash_grid_indices(x, levels, smoothstep)
    C, _, F_phys = table.shape
    Fl = features_per_logical
    P = F_phys // Fl
    N, L = x.shape[0], levels.n_levels
    code_r = code.reshape(N, C, P).astype(jnp.float32)  # [N, C, P]

    out = jnp.zeros((N, L, Fl), jnp.float32)
    for corner in range(8):
        g = jnp.take(table, flat_idx[:, :, corner], axis=1)  # [C, N, L, F_phys]
        g = g.astype(jnp.float32).reshape(C, N, L, P, Fl)
        # contract over (C, P) with per-sample code
        blended = jnp.einsum("cnlpf,ncp->nlf", g, code_r)
        out = out + weights[:, :, corner, None] * blended
    return out.reshape(N, L * Fl)


def hash_table_param_count(levels: HashGridLevels, n_tables: int,
                           features_per_entry: int) -> int:
    return levels.total_entries * n_tables * features_per_entry
