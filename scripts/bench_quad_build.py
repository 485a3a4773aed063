"""Micro-bench: quad-table build/fold formulations (round-4 perf hunt).

The round-4 trace decomposition of the 310 ms flagship step attributes
~40 ms to the quad build forward (64 slice_dynamic-update-slice fusions at
~1.1 ms each + the [E, 4W] concat + layout copies — ~6x off the ~9 ms HBM
roofline for read 4x0.84 GB + write 3.3 GB) and ~20 ms to the gradient fold.
This script A/B-tests formulations on the real flagship table shape:

  a) current: per-level jnp.roll + concat (ops/hash_encoding.quad_from_cast)
  b) slice-pair: roll expressed as explicit concat([seg[s:], seg[:s]])
  c) doubled-table: one [2E, W] per-level-doubled copy, then every rolled
     segment is ONE contiguous slice of it
  d) (if present) pallas copy kernel

Run on an idle TPU: python scripts/bench_quad_build.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timed(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])  # force scalar fetch (axon)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1000.0


def run_diagnostics(block=None):
    """Build-kernel cost ladder on the flagship table shape.

    Each rung adds one suspected cost source over the previous; the deltas
    attribute the gap between the full Pallas build (64.1 ms round 4) and
    the ~12 ms HBM roofline (read 7x0.84 GB windows + write 3.34 GB at
    ~800 GB/s):

      copy    — 1 fetch [B, W] -> write [B, W]: the DMA floor per block
      bcast   — 1 fetch        -> write [B, 4W]: + full output bytes
      fetch7  — 7 fetches      -> write [B, 4W]: + the build's DMA count
      build   — the real kernel: + wrap branches and two-piece concats
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nersemble_tpu.ops import quad_pallas
    from nersemble_tpu.ops.hash_encoding import HashGridLevels

    B = block or quad_pallas.BLOCK
    levels = HashGridLevels.create()
    E, W = levels.total_entries, 64
    E = (E // B) * B  # diagnostics ignore level structure
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((E, W)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    n_blocks = E // B
    print(f"diagnostics: [E={E}, W={W}] bf16, BLOCK={B}, {n_blocks} blocks")

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    copy = pl.pallas_call(
        copy_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((B, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, W), table.dtype),
        interpret=quad_pallas.INTERPRET,
    )
    print(f"copy   [B,W]->[B,W]:    {timed(jax.jit(lambda t: copy(t)), table):8.1f} ms "
          f"(moves {2 * E * W * 2 / 1e9:.1f} GB)")

    def bcast_kernel(x_ref, o_ref):
        x = x_ref[...]
        for q in range(4):
            o_ref[:, q * W:(q + 1) * W] = x

    bcast = pl.pallas_call(
        bcast_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((B, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 4 * W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 4 * W), table.dtype),
        interpret=quad_pallas.INTERPRET,
    )
    print(f"bcast  [B,W]->[B,4W]:   {timed(jax.jit(lambda t: bcast(t)), table):8.1f} ms "
          f"(moves {(E * W + E * 4 * W) * 2 / 1e9:.1f} GB)")

    def fetch7_kernel(*refs):
        o_ref = refs[-1]
        o_ref[:, 0:W] = refs[0][...]
        for q in range(1, 4):
            # same two-refs-per-quarter structure as the build, no concat
            o_ref[:, q * W:(q + 1) * W] = refs[2 * q - 1][...]

    fetch7 = pl.pallas_call(
        fetch7_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((B, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((B, 4 * W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 4 * W), table.dtype),
        interpret=quad_pallas.INTERPRET,
    )
    print(f"fetch7 7x[B,W]->[B,4W]: "
          f"{timed(jax.jit(lambda t: fetch7(*([t] * 7))), table):8.1f} ms "
          f"(moves {(7 * E * W + E * 4 * W) * 2 / 1e9:.1f} GB)")

    if quad_pallas.available(levels, W) and B == quad_pallas.BLOCK:
        full_levels = HashGridLevels.create()
        tbl = jnp.asarray(rng.standard_normal(
            (full_levels.total_entries, W)).astype(np.float32)
        ).astype(jnp.bfloat16)
        pb = jax.jit(lambda t: quad_pallas.build(t, full_levels))
        print(f"build  (real kernel):   {timed(pb, tbl):8.1f} ms")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas-build-only", action="store_true",
                    help="time ONLY the pallas build kernel (fast iteration; "
                         "equality vs XLA is covered by the interpret-mode "
                         "test and was asserted on-TPU round 4)")
    ap.add_argument("--skip-alt-xla", action="store_true",
                    help="skip the b/c alternative XLA formulations (already "
                         "measured: slice-pair 70.6 ms, doubled-table 100 ms "
                         "on v5e round 4)")
    ap.add_argument("--diag", action="store_true",
                    help="run the build-kernel DIAGNOSTIC ladder instead: "
                         "identity copy (DMA floor) -> broadcast-quarters "
                         "(output-write cost) -> 7-fetch compose (DMA-issue "
                         "cost) vs the full build (adds wrap branches). "
                         "Isolates what bounds the 64 ms build.")
    ap.add_argument("--block", type=int, default=None,
                    help="diagnostic block size (default quad_pallas.BLOCK)")
    args = ap.parse_args()

    if args.diag:
        return run_diagnostics(args.block)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nersemble_tpu.ops.hash_encoding import (HashGridLevels,
                                                 _quad_bwd_xla, _quad_fwd_xla)

    if args.block:
        # experiment: repad the level layout to the requested block size
        # (HashGridLevels.create reads quad_pallas.BLOCK at create time)
        from nersemble_tpu.ops import quad_pallas
        quad_pallas.BLOCK = args.block
        quad_pallas._block_meta.cache_clear()

    levels = HashGridLevels.create()  # flagship: 16 levels, 2^19
    E, W = levels.total_entries, 64
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((E, W)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    print(f"table [E={E}, W={W}] bf16 = {E * W * 2 / 1e9:.2f} GB; "
          f"quad out = {E * 4 * W * 2 / 1e9:.2f} GB")

    if args.pallas_build_only:
        from nersemble_tpu.ops import quad_pallas
        assert quad_pallas.available(levels, W)
        pb = jax.jit(lambda t: quad_pallas.build(t, levels))
        print(f"e) pallas build fwd:        {timed(pb, table):8.1f} ms "
              f"(BLOCK={quad_pallas.BLOCK})")
        return

    # ---- a) XLA roll+concat (the pre-round-4 production path) ----
    cur = jax.jit(lambda t: _quad_fwd_xla(t, levels))
    print(f"a) XLA roll+concat fwd:     {timed(cur, table):8.1f} ms")

    ref = np.asarray(cur(table))

    # ---- b) slice-pair concat ----
    def build_slicepair(t):
        quarters = []
        for strides in (tuple(0 for _ in levels.x_strides),
                        levels.z_strides, levels.x_strides,
                        tuple(x + z for x, z in zip(levels.x_strides,
                                                    levels.z_strides))):
            parts = []
            for l in range(levels.n_levels):
                off, size = levels.offsets[l], levels.sizes[l]
                s = strides[l] % size
                seg = jax.lax.slice_in_dim(t, off, off + size, axis=0)
                if s == 0:
                    parts.append(seg)
                else:
                    parts.append(jax.lax.slice_in_dim(seg, s, size, axis=0))
                    parts.append(jax.lax.slice_in_dim(seg, 0, s, axis=0))
            quarters.append(jnp.concatenate(parts, axis=0))
        return jnp.concatenate(quarters, axis=1)

    if not args.skip_alt_xla:
        sp = jax.jit(build_slicepair)
        got = np.asarray(sp(table))
        assert np.array_equal(ref, got), "slice-pair build mismatch"
        print(f"b) slice-pair concat fwd:   {timed(sp, table):8.1f} ms")

    # ---- c) doubled table ----
    def build_doubled(t):
        segs = []
        for l in range(levels.n_levels):
            seg = jax.lax.slice_in_dim(t, levels.offsets[l],
                                       levels.offsets[l] + levels.sizes[l],
                                       axis=0)
            segs += [seg, seg]
        t2 = jnp.concatenate(segs, axis=0)  # [2E, W]
        doff = {}
        acc = 0
        for l in range(levels.n_levels):
            doff[l] = acc
            acc += 2 * levels.sizes[l]
        quarters = []
        for strides in (tuple(0 for _ in levels.x_strides),
                        levels.z_strides, levels.x_strides,
                        tuple(x + z for x, z in zip(levels.x_strides,
                                                    levels.z_strides))):
            parts = []
            for l in range(levels.n_levels):
                s = strides[l] % levels.sizes[l]
                parts.append(jax.lax.slice_in_dim(
                    t2, doff[l] + s, doff[l] + s + levels.sizes[l], axis=0))
            quarters.append(jnp.concatenate(parts, axis=0))
        return jnp.concatenate(quarters, axis=1)

    if not args.skip_alt_xla:
        db = jax.jit(build_doubled)
        got = np.asarray(db(table))
        assert np.array_equal(ref, got), "doubled build mismatch"
        print(f"c) doubled-table fwd:       {timed(db, table):8.1f} ms")

    # ---- fold (bwd) variants ----
    gq = jnp.asarray(rng.standard_normal((E, 4 * W)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def fold_cur(g):
        return _quad_bwd_xla(g, levels)

    print(f"fold) XLA roll+add bwd:     {timed(jax.jit(fold_cur), gq):8.1f} ms")

    def fold_slicepair(g):
        # inverse roll via slice-pair on each quarter band, f32 accumulate
        out = []
        for l in range(levels.n_levels):
            off, size = levels.offsets[l], levels.sizes[l]
            acc = None
            for q, strides in enumerate((
                    tuple(0 for _ in levels.x_strides), levels.z_strides,
                    levels.x_strides,
                    tuple(x + z for x, z in zip(levels.x_strides,
                                                levels.z_strides)))):
                s = (-strides[l]) % size  # inverse (positive) roll
                band = jax.lax.slice(g, (off, q * W), (off + size, (q + 1) * W))
                if s:
                    band = jnp.concatenate(
                        [jax.lax.slice_in_dim(band, s, size, axis=0),
                         jax.lax.slice_in_dim(band, 0, s, axis=0)], axis=0)
                band = band.astype(jnp.float32)
                acc = band if acc is None else acc + band
            out.append(acc.astype(g.dtype))
        return jnp.concatenate(out, axis=0)

    ref_fold = np.asarray(jax.jit(fold_cur)(gq))
    if not args.skip_alt_xla:
        fsp = jax.jit(fold_slicepair)
        got_fold = np.asarray(fsp(gq))
        assert np.array_equal(ref_fold, got_fold), "slice-pair fold mismatch"
        print(f"fold) slice-pair:           {timed(fsp, gq):8.1f} ms")

    # ---- e) pallas kernels (round 4) ----
    from nersemble_tpu.ops import quad_pallas

    if quad_pallas.available(levels, W):
        pb = jax.jit(lambda t: quad_pallas.build(t, levels))
        got = np.asarray(pb(table))
        assert np.array_equal(ref, got), "pallas build mismatch"
        print(f"e) pallas build fwd:        {timed(pb, table):8.1f} ms")

        try:
            pf = jax.jit(lambda g: quad_pallas.fold(g, levels))
            got_fold = np.asarray(pf(gq))
            assert np.array_equal(ref_fold, got_fold), "pallas fold mismatch"
            print(f"fold) pallas:               {timed(pf, gq):8.1f} ms")
        except Exception as e:  # full-width fetches can OOM VMEM at big BLOCK
            print(f"fold) pallas: failed ({type(e).__name__}); production "
                  f"uses the XLA fold anyway")
    else:
        print("e) pallas kernels: unavailable on this backend/layout")


if __name__ == "__main__":
    main()
