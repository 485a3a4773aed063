"""Pallas TPU kernels for the xz-quad table build and its gradient fold.

The quad build (ops/hash_encoding.py::quad_from_cast) turns the canonical
hash table [E, W] into the [E, 4W] gather operand: per level, quarter q is a
cyclic roll of the level segment by -stride_q rows. Expressed in XLA
(roll/slice + concat) the op runs ~6-8x off its HBM roofline on v5e
(measured 75/62 ms build/fold vs ~9 ms roofline for the flagship
0.84 GB -> 3.34 GB build, scripts/bench_quad_build.py): each 64-column
quarter band is written as a 128 B-granular strided stream into the
512 B-stride [E, 4W] rows, and XLA lowers the rolls as long
dynamic-update-slice chains.

These kernels instead compose each FULL-WIDTH output tile in VMEM and write
it contiguously:

- grid = one step per BLOCK (see the ``BLOCK`` constant) of the entry axis;
  level sizes and
  offsets are padded to BLOCK multiples by ``HashGridLevels.create`` (dense
  levels only — hashed levels are a power of two already; tables with any
  non-aligned level fall back to the XLA path).
- Per quarter, the rolled window [g*B + s_q, g*B + s_q + B) mod size spans at
  most two consecutive level blocks; both are fetched via scalar-prefetched
  block index maps. The in-block shift s_q % B is CONSTANT per (level,
  quarter), so the window cut is a STATIC two-piece slice selected by a
  per-block branch id (``pl.when`` chain over the distinct shift tuples).
  A dynamic in-kernel cut was tried first and rejected: Mosaic's
  ``dynamic_rotate`` only exists for 32-bit lanes, and even via an exact
  f32 round trip the rotate is vector-shuffle-bound — 80.5 ms, WORSE than
  the XLA path (measured round 4).
- Quarter 0 never shifts (stride 0), so it is a single identity-mapped
  fetch: 7 input blocks per output block, not 8.
- The fold (backward) kernel runs the same recipe with the inverse shifts.
  Its quarter bands are 64-column slabs of the [E, 4W] gradient — narrower
  than the 128-lane tile, so blocks fetch the FULL 4W width and the kernel
  slices the band statically. The 2x HBM read amplification makes it LOSE
  to the XLA fold (74.7 vs 61.6 ms, flagship table, round 4), so production
  (hash_encoding._quad_vjp_bwd) keeps the XLA fold; the kernel stays for
  the record and the interpret-mode equality test. Accumulation is f32
  (same contract as the XLA fold).

The per-block index/branch tables are tiny int32 host-side numpy arrays,
cached per levels object and prefetched to SMEM. They are laid out
quarter-major [4, n_blocks]: SMEM pads the minor axis to 128 lanes, so
[n_blocks, 4] would allocate 32x the data (3.3 MB > the 1 MB SMEM budget —
seen live).

Replaces the hot-path share of tcnn's HashGrid encoding setup (reference:
src/nersemble/nerfstudio/field_components/hash_ensemble.py:41-52 — tcnn
needs no build step because CUDA gathers 8 scattered corners per sample;
the TPU design trades this once-per-step sequential build for 4x fewer
gather/scatter rows, see ops/hash_encoding.py docstring point 2).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # deferred so CPU-only environments never touch Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# Rows per grid step. Level sizes/offsets must be multiples of this for the
# kernels to apply (HashGridLevels.create pads dense levels accordingly).
# 2048 over 1024: the build kernel is DMA-issue-bound (7 scalar-indexed
# descriptors per grid step), so coarser blocks amortize issue overhead.
# 4096 OOMs scoped VMEM (18 MB > 16 MB: 7 wide fold fetches + two-piece
# temporaries, double-buffered); 2048 fits.
BLOCK = 2048

# Set True (tests) to run in the Pallas interpreter on any backend.
INTERPRET = False

_N_QUARTERS = 4


def available(levels, row_width: int) -> bool:
    """Kernels apply: TPU backend (or interpreter), block-aligned layout."""
    if not _PALLAS_OK:
        return False
    if not (INTERPRET or jax.default_backend() == "tpu"):
        return False
    if row_width % 8 != 0:
        return False
    return all(s % BLOCK == 0 for s in levels.sizes)


def _quarter_strides(levels):
    """Per-quarter roll strides, quarter order (1, z, x, xz) as in the build."""
    return (tuple(0 for _ in levels.x_strides), levels.z_strides,
            levels.x_strides,
            tuple(x + z for x, z in zip(levels.x_strides, levels.z_strides)))


@functools.lru_cache(maxsize=8)
def _block_meta(levels, inverse: bool):
    """Static per-block metadata for the kernels.

    Returns ``(idx0, idx1, bid, shift_keys)``:

    - ``idx0``/``idx1``: int32 [4, n_blocks] — for output block g and
      quarter q, the source window starts at global row
      ``idx0[q, g] * BLOCK + shift`` and runs BLOCK rows, wrapping into
      block ``idx1[q, g]`` (the cyclically-next block of the same level).
    - ``bid``: int32 [n_blocks] — branch id selecting the (static) in-block
      shift tuple of the block's level.
    - ``shift_keys``: tuple of distinct (s1, s2, s3) in-block shift tuples
      (quarter 0 always shifts by 0), indexed by branch id. The in-block
      shift ``(k*B + s) % B = s % B`` is independent of k, so it is a
      compile-time constant per branch.

    ``inverse`` selects the fold's inverse rolls (+stride instead of
    -stride).
    """
    n_blocks = levels.total_entries // BLOCK
    idx0 = np.zeros((_N_QUARTERS, n_blocks), np.int32)
    idx1 = np.zeros((_N_QUARTERS, n_blocks), np.int32)
    bid = np.zeros(n_blocks, np.int32)
    quarters = _quarter_strides(levels)
    keys = []
    for l in range(levels.n_levels):
        size, off = levels.sizes[l], levels.offsets[l]
        nb = size // BLOCK
        base = off // BLOCK
        level_shifts = []
        for q in range(_N_QUARTERS):
            s = quarters[q][l] % size
            if inverse:
                s = (size - s) % size
            level_shifts.append(s % BLOCK)
            for k in range(nb):
                i0 = (k * BLOCK + s) % size
                b0 = i0 // BLOCK
                idx0[q, base + k] = base + b0
                idx1[q, base + k] = base + (b0 + 1) % nb
        assert level_shifts[0] == 0, "quarter 0 stride must be 0"
        key = tuple(level_shifts[1:])
        if key not in keys:
            keys.append(key)
        bid[base:base + nb] = keys.index(key)
    return idx0, idx1, bid, tuple(keys)


def _two_piece(x0, x1, s):
    """Rows [s, s+BLOCK) of concat(x0, x1) — s is a COMPILE-TIME constant."""
    if s == 0:
        return x0
    return jnp.concatenate([x0[s:], x1[:s]], axis=0)


def _band_refs(refs, q):
    """(first, second) input refs for quarter q (quarter 0 has no second)."""
    if q == 0:
        return refs[0], None
    return refs[2 * q - 1], refs[2 * q]


def _make_build_kernel(shift_keys, w):
    def kernel(bid_ref, idx0_ref, idx1_ref, *refs):
        del idx0_ref, idx1_ref
        out_ref = refs[-1]
        g = pl.program_id(0)
        bid = bid_ref[g]
        out_ref[:, 0:w] = refs[0][...]  # quarter 0: identity
        for i, key in enumerate(shift_keys):
            @pl.when(bid == i)
            def _(key=key):
                for q in range(1, _N_QUARTERS):
                    x0, x1 = _band_refs(refs, q)
                    band = _two_piece(x0[...], x1[...], key[q - 1])
                    out_ref[:, q * w:(q + 1) * w] = band
    return kernel


def _in_specs(block_w, n_quarters=_N_QUARTERS):
    """7 input block specs: 1 identity fetch for quarter 0, wrap pairs for
    the rest. ``block_w`` is the fetched block width (the fold fetches
    full-width blocks)."""

    def spec(q, second):
        def index_map(g, bid, i0, i1, q=q, second=second):
            return ((i1 if second else i0)[q, g], 0)

        return pl.BlockSpec((BLOCK, block_w), index_map,
                            memory_space=pltpu.VMEM)

    specs = [pl.BlockSpec((BLOCK, block_w), lambda g, bid, i0, i1: (g, 0),
                          memory_space=pltpu.VMEM)]
    for q in range(1, n_quarters):
        specs += [spec(q, False), spec(q, True)]
    return specs


def build(table: jnp.ndarray, levels) -> jnp.ndarray:
    """[E, W] (already cast) -> [E, 4W] quad gather operand."""
    e, w = table.shape
    idx0, idx1, bid, shift_keys = _block_meta(levels, False)
    n_blocks = e // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=_in_specs(w),
        out_specs=pl.BlockSpec((BLOCK, _N_QUARTERS * w),
                               lambda g, bid, i0, i1: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_build_kernel(shift_keys, w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, _N_QUARTERS * w), table.dtype),
        interpret=INTERPRET,
    )(jnp.asarray(bid), jnp.asarray(idx0), jnp.asarray(idx1),
      *([table] * (2 * _N_QUARTERS - 1)))


def _make_fold_kernel(shift_keys, w):
    def kernel(bid_ref, idx0_ref, idx1_ref, *refs):
        del idx0_ref, idx1_ref
        out_ref = refs[-1]
        g = pl.program_id(0)
        bid = bid_ref[g]
        acc0 = refs[0][:, 0:w].astype(jnp.float32)  # quarter 0: identity
        for i, key in enumerate(shift_keys):
            @pl.when(bid == i)
            def _(key=key):
                acc = acc0
                for q in range(1, _N_QUARTERS):
                    x0, x1 = _band_refs(refs, q)
                    band = _two_piece(x0[:, q * w:(q + 1) * w],
                                      x1[:, q * w:(q + 1) * w], key[q - 1])
                    acc = acc + band.astype(jnp.float32)
                out_ref[...] = acc.astype(out_ref.dtype)
    return kernel


def fold(g_quad: jnp.ndarray, levels) -> jnp.ndarray:
    """[E, 4W] quad gradient -> [E, W] canonical gradient (f32 accumulate).

    Quarter q's gradient for canonical entry e sits at quad row
    ``(e - stride_q) % size`` — the inverse rolls. The 64-column quarter
    bands are narrower than the 128-lane tile, so blocks fetch the full 4W
    width and slice the band in VMEM.
    """
    e, w4 = g_quad.shape
    w = w4 // _N_QUARTERS
    idx0, idx1, bid, shift_keys = _block_meta(levels, True)
    n_blocks = e // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=_in_specs(w4),
        out_specs=pl.BlockSpec((BLOCK, w), lambda g, bid, i0, i1: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_fold_kernel(shift_keys, w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, w), g_quad.dtype),
        interpret=INTERPRET,
    )(jnp.asarray(bid), jnp.asarray(idx0), jnp.asarray(idx1),
      *([g_quad] * (2 * _N_QUARTERS - 1)))
