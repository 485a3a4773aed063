"""Hardware probe: int32 indices bitcast to float32 are flushed to zero on TPU.

The round-2..4 compaction path packed per-ray int32 metadata (timestep index,
camera index) into the f32 compaction row-gather operand via
``lax.bitcast_convert_type`` and bitcast them back after the gather
(models/nersemble.py, ray_pack). Int32 values below ~2^23 bitcast to float32
subnormals (1 -> 1.4e-45), and TPU vector hardware flushes subnormals to zero
wherever the fused concat+gather touches arithmetic — so ON DEVICE every ray
decoded as timestep 0 / camera 0, while the bit-identical program on CPU
(which preserves denormals) passes every gradient test.

Live blast radius (round 5, run NERS-001-quality-dynamic, step 9410): Adam
``nu`` for time-embedding rows 1..15 bitwise zero after 9,400 steps — those
rows never received a single gradient — and the hold-out PSNR sat at
13.96 +/- 0.01 dB for 4,000 straight steps (the model fits the 16 timesteps'
images as ONE static mean scene). Every dynamic quality run since round 2
(QUALITY_r2 ~15-16 dB flat/declining) was silently reduced to this.

Fix: carry small ints as f32 VALUES (exact below 2^24) and decode with a
value cast. Pinned structurally by
tests/test_model.py::test_no_subnormal_int_carriers_in_render (no signed-int
-> float bitcast may appear anywhere in the traced render step).

Run on the TPU host:  python scripts/probe_subnormal_carrier.py
Expected on TPU:   old (bitcast) decodes all-zero, new (value) round-trips.
Expected on CPU:   both round-trip (which is why CPU tests never caught it).
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def old_carrier(ts, sel):
    pack = jnp.concatenate([
        jnp.ones((16, 6), jnp.float32),
        jax.lax.bitcast_convert_type(ts, jnp.float32)[:, None],
        jnp.zeros((16, 1), jnp.float32)], axis=1)
    picked = jnp.take(pack, sel, axis=0)
    return jax.lax.bitcast_convert_type(picked[:, 6], jnp.int32)


@jax.jit
def new_carrier(ts, sel):
    pack = jnp.concatenate([
        jnp.ones((16, 6), jnp.float32),
        ts.astype(jnp.float32)[:, None],
        jnp.zeros((16, 1), jnp.float32)], axis=1)
    picked = jnp.take(pack, sel, axis=0)
    return picked[:, 6].astype(jnp.int32)


def main():
    print("devices:", jax.devices())
    ts = jnp.arange(16, dtype=jnp.int32)
    sel = jnp.arange(16, dtype=jnp.int32)
    old = np.asarray(old_carrier(ts, sel))
    new = np.asarray(new_carrier(ts, sel))
    print("input ts     :", np.asarray(ts))
    print("old (bitcast):", old)
    print("new (value)  :", new)
    assert (new == np.arange(16)).all(), "value carrier must round-trip"
    if (old[1:] == 0).all():
        print("-> bitcast carrier FLUSHED to zero on this backend "
              "(TPU subnormal flush reproduced)")
    else:
        print("-> bitcast carrier survives on this backend "
              "(denormal-preserving, e.g. CPU)")


if __name__ == "__main__":
    main()
