"""Unit tests for compute ops vs dense/naive reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nersemble_tpu.ops.distortion import distortion_loss, distortion_loss_reference
from nersemble_tpu.ops.hash_encoding import (
    HashGridLevels,
    build_quad_table,
    hash_encode,
    hash_encode_blended,
    hash_grid_indices,
    init_hash_table,
)
from nersemble_tpu.ops import quad_pallas
from nersemble_tpu.ops.hash_ensemble import effective_blend_code
from nersemble_tpu.ops.losses import (
    alpha_loss,
    depth_loss,
    empty_loss,
    masked_rgb_loss,
    near_loss,
)
from nersemble_tpu.ops.mlp import apply_mlp, init_mlp
from nersemble_tpu.ops.posenc import posenc_out_dim, windowed_posenc
from nersemble_tpu.ops.rendering import (
    render_accumulation,
    render_depth_expected,
    render_rgb,
    render_weights,
)
from nersemble_tpu.ops.sampling import (
    march_rays,
    occupancy_lookup,
    ray_aabb_intersect,
)
from nersemble_tpu.ops.sh import sh_encoding
from nersemble_tpu.ops.trunc_exp import trunc_exp


def test_trunc_exp():
    x = jnp.array([-20.0, 0.0, 2.0, 20.0])
    y = trunc_exp(x)
    assert np.allclose(np.asarray(y), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    # gradient clamped at |x| = 15
    assert np.allclose(np.asarray(g),
                       np.exp(np.clip(np.asarray(x), -15, 15)), rtol=1e-5)


def test_windowed_posenc_layout():
    x = jnp.array([[0.1, 0.2, 0.3]])
    out = windowed_posenc(x, num_frequencies=4, include_input=True)
    assert out.shape == (1, posenc_out_dim(3, 4, True))
    # manual: d-major (d0f0, d0f1, ..., d2f3), sin then cos, then 2*pi*x
    scaled = 2 * np.pi * np.asarray(x)
    freqs = 2.0 ** np.linspace(0, 3, 4)
    angles = (scaled[..., None] * freqs).reshape(1, -1)
    expected = np.concatenate([np.sin(angles), np.cos(angles), scaled], axis=-1)
    assert np.allclose(np.asarray(out), expected, atol=1e-5)

    # full window == no window
    w_full = windowed_posenc(x, 4, window_param=4.0)
    assert np.allclose(np.asarray(w_full), np.asarray(out), atol=1e-6)
    # zero window kills all bands but keeps the raw input
    w_zero = np.asarray(windowed_posenc(x, 4, window_param=0.0))
    assert np.allclose(w_zero[:, :-3], 0.0, atol=1e-6)
    assert np.allclose(w_zero[:, -3:], scaled, atol=1e-5)


def test_sh_unit_power():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    y = np.asarray(sh_encoding(jnp.asarray(d), 4))
    assert y.shape == (64, 16)
    # sum over m of Y_lm^2 == (2l+1)/(4pi) for each band l
    for l, sl in [(0, slice(0, 1)), (1, slice(1, 4)), (2, slice(4, 9)), (3, slice(9, 16))]:
        power = (y[:, sl] ** 2).sum(-1)
        assert np.allclose(power, (2 * l + 1) / (4 * np.pi), atol=1e-4), l


def test_mlp_shapes_and_skip():
    rng = jax.random.PRNGKey(0)
    params = init_mlp(rng, in_dim=10, out_dim=5, num_layers=6, layer_width=32,
                      skip_connections=(4,))
    x = jnp.ones((7, 10))
    out = apply_mlp(params, x, skip_connections=(4,))
    assert out.shape == (7, 5)
    assert out.dtype == jnp.float32
    # single-layer MLP == plain linear
    p1 = init_mlp(rng, 8, 3, num_layers=1, layer_width=64)
    assert p1["layers"][0]["w"].shape == (8, 3)
    # out_init_scale makes output near zero
    p2 = init_mlp(rng, 8, 3, num_layers=2, layer_width=16, out_init_scale=1e-5)
    out2 = apply_mlp(p2, jnp.ones((4, 8)))
    assert np.abs(np.asarray(out2)).max() < 1e-3


# ---------------------------------------------------------------------------
# Hash encoding
# ---------------------------------------------------------------------------

def _naive_hash_encode(table, x, levels):
    """Straightforward per-level, per-sample trilerp reference (numpy).

    ``table`` is the CANONICAL [E, W] layout; mirrors the xz-quad semantics of
    ops/hash_encoding.py: 2 explicit y-corners at the floor (x, z) cell, x/z
    interpolation between entry ``idx`` and its per-level x/z successors
    ``idx + sx`` / ``idx + sz`` (cyclic within the level segment)."""
    table = np.asarray(table)
    x = np.asarray(x)
    N = x.shape[0]
    W = table.shape[1]
    out = np.zeros((N, levels.n_levels, W), np.float32)
    mask = np.uint32(2 ** levels.log2_hashmap_size - 1)
    for l in range(levels.n_levels):
        scale = levels.scales[l]
        res = levels.resolutions[l]
        size = levels.sizes[l]
        sx = levels.x_strides[l] % size
        sz = levels.z_strides[l] % size
        pos = x * scale + 0.5
        g0 = np.floor(pos).astype(np.int64)
        w = pos - g0
        cx = np.clip(g0[:, 0], 0, res - 1)
        cz = np.clip(g0[:, 2], 0, res - 1)
        fx, fz = w[:, 0], w[:, 2]
        for cj in (0, 1):
            cy = np.clip(g0[:, 1] + cj, 0, res - 1)
            if levels.hashed[l]:
                h = (cy.astype(np.uint64) * 2654435761
                     + cx.astype(np.uint64) * levels.x_strides[l]
                     + cz.astype(np.uint64) * levels.z_strides[l])
                idx = (h & np.uint64(mask)).astype(np.int64)
            else:
                idx = cy + levels.x_strides[l] * cx + levels.z_strides[l] * cz
            wy = (w[:, 1] if cj else 1 - w[:, 1])
            base = levels.offsets[l]
            q00 = table[base + idx]
            q01 = table[base + (idx + sz) % size]
            q10 = table[base + (idx + sx) % size]
            q11 = table[base + (idx + sx + sz) % size]
            lerp = ((1 - fx) * (1 - fz))[:, None] * q00 \
                + ((1 - fx) * fz)[:, None] * q01 \
                + (fx * (1 - fz))[:, None] * q10 \
                + (fx * fz)[:, None] * q11
            out[:, l] += wy[:, None] * lerp
    return out  # [N, L, W]


@pytest.fixture(scope="module")
def small_levels():
    # includes both dense and hashed levels (res 5..33, hash from res^3 > 2^10)
    return HashGridLevels.create(n_levels=6, log2_hashmap_size=10,
                                 base_resolution=4, per_level_scale=1.5)


def test_hash_levels_structure(small_levels):
    lv = small_levels
    assert lv.n_levels == 6
    assert lv.resolutions[0] == 5
    # dense level 0: idx = y + SX*x + SZ*z with SX = ceil32(5) = 32, SZ = 160;
    # the 800 live rows are padded to one quad_pallas.BLOCK (dead parameters
    # beyond row 800 — boundary roll successors land there instead of
    # aliasing live entries)
    assert not lv.hashed[0] and lv.x_strides[0] == 32 and lv.z_strides[0] == 160
    assert lv.sizes[0] == quad_pallas.BLOCK and lv.sizes[0] >= 160 * 5
    assert any(lv.hashed)
    for l in range(6):
        assert lv.sizes[l] % 32 == 0
        assert lv.offsets[l] % 32 == 0
        if not lv.hashed[l]:
            assert lv.sizes[l] % quad_pallas.BLOCK == 0
        assert lv.x_strides[l] % 32 == 0 and lv.x_strides[l] > 0
        assert lv.z_strides[l] % 32 == 0 and lv.z_strides[l] > 0
        if lv.hashed[l]:
            assert lv.sizes[l] == 1024
    assert lv.total_entries == sum(lv.sizes)
    assert lv.offsets[-1] == sum(lv.sizes[:-1])


def test_hash_encode_matches_naive(small_levels):
    rng = jax.random.PRNGKey(1)
    table = init_hash_table(rng, small_levels, row_width=4)
    quad = build_quad_table(table, small_levels, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(2), (17, 3))
    out = np.asarray(hash_encode(quad, x, small_levels))
    ref = _naive_hash_encode(table, x, small_levels).reshape(17, -1)
    assert out.shape == (17, 6 * 4)
    assert np.allclose(out, ref, atol=1e-5)


def test_quad_table_successors_are_xz_neighbors(small_levels):
    """Interior cells: the quad row's quarters == the canonical features of
    the true z+1 / x+1 / (x+1,z+1) vertices (the point of the additive
    index layout)."""
    lv = small_levels
    rng = np.random.default_rng(0)
    table = np.asarray(init_hash_table(jax.random.PRNGKey(0), lv, 4))
    quad = np.asarray(build_quad_table(jnp.asarray(table), lv,
                                       dtype=jnp.float32))
    mask = np.uint32(2 ** lv.log2_hashmap_size - 1)
    for l in range(lv.n_levels):
        res = lv.resolutions[l]
        cy = rng.integers(0, res)
        cx, cz = rng.integers(0, res - 1, 2)  # interior: x+1, z+1 valid

        def idx(x, z):
            if lv.hashed[l]:
                h = (int(cy) * 2654435761 + int(x) * lv.x_strides[l]
                     + int(z) * lv.z_strides[l])
                return int(h & int(mask))
            return int(cy + lv.x_strides[l] * x + lv.z_strides[l] * z)

        base = lv.offsets[l]
        e = idx(cx, cz)
        for q, (dx, dz) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            np.testing.assert_array_equal(
                quad[base + e, 4 * q:4 * (q + 1)],
                table[base + idx(cx + dx, cz + dz)],
                err_msg=f"level {l} quarter {q}")


def test_hash_encode_blended_matches_einsum(small_levels):
    # H=4 logical tables x F_l=2 -> row width 8
    rng = jax.random.PRNGKey(3)
    table = init_hash_table(rng, small_levels, row_width=8)
    quad = build_quad_table(table, small_levels, dtype=jnp.float32)
    N = 11
    x = jax.random.uniform(jax.random.PRNGKey(4), (N, 3))
    code = jax.random.normal(jax.random.PRNGKey(5), (N, 4))

    out = np.asarray(hash_encode_blended(quad, x, code, small_levels,
                                         features_per_logical=2))
    assert out.shape == (N, 6 * 2)

    # reference path: full per-table embeddings then the reference's blend
    # einsum (hash_ensemble.py:112,156): emb [N, L*Fl, H] x code [N, H]
    emb = _naive_hash_encode(table, x, small_levels)  # [N, L, W=H*Fl]
    L, Fl, H = 6, 2, 4
    emb = emb.reshape(N, L, H, Fl)
    emb = np.einsum("nlhf->nlfh", emb).reshape(N, L * Fl, H)
    expected = np.einsum("ndh,nh->nd", emb, np.asarray(code))
    assert np.allclose(out, expected, atol=1e-4)


def test_hash_encode_gradients(small_levels):
    rng = jax.random.PRNGKey(6)
    table = init_hash_table(rng, small_levels, row_width=2)
    x = jax.random.uniform(jax.random.PRNGKey(7), (5, 3), minval=0.1, maxval=0.9)

    def loss_t(t):
        quad = build_quad_table(t, small_levels, dtype=jnp.float32)
        return jnp.sum(hash_encode(quad, x, small_levels) ** 2)

    g_table = jax.grad(loss_t)(table)
    assert np.isfinite(np.asarray(g_table)).all()
    assert np.abs(np.asarray(g_table)).sum() > 0

    quad = build_quad_table(table, small_levels, dtype=jnp.float32)

    def loss_x(xx):
        return jnp.sum(hash_encode(quad, xx, small_levels) ** 2)

    g_x = jax.grad(loss_x)(x)
    assert np.isfinite(np.asarray(g_x)).all()
    assert np.abs(np.asarray(g_x)).sum() > 0  # gradients flow to positions


def test_effective_blend_code():
    code = jnp.array([[0.5, -0.2, 0.3, 0.1]])
    H = 4
    # no window -> unchanged
    assert np.allclose(np.asarray(effective_blend_code(code, None, H)), np.asarray(code))
    # w=1, disable_initial: all-ones code, window keeps only table 0
    out = np.asarray(effective_blend_code(code, 1.0, H,
                                          disable_initial_hash_ensemble=True,
                                          use_soft_transition=True))
    assert out[0, 0] == pytest.approx(1.0)
    assert np.allclose(out[0, 1:], 0.0, atol=1e-6)
    # w=1.5, soft transition: first entry lerped halfway, table1 half-windowed
    out = np.asarray(effective_blend_code(code, 1.5, H,
                                          disable_initial_hash_ensemble=True,
                                          use_soft_transition=True))
    assert out[0, 0] == pytest.approx(0.5 * 0.5 + 0.5 * 1.0)
    assert out[0, 1] == pytest.approx(0.5 * (-0.2) * 0.5)  # alpha * code * hann(0.5)
    # w=H: full window, raw code
    out = np.asarray(effective_blend_code(code, float(H), H,
                                          disable_initial_hash_ensemble=True,
                                          use_soft_transition=True))
    assert np.allclose(out, np.asarray(code), atol=1e-6)


# ---------------------------------------------------------------------------
# Rendering
# ---------------------------------------------------------------------------

def test_render_weights_matches_cumprod_reference():
    rng = np.random.default_rng(3)
    R, S = 4, 16
    sigmas = jnp.asarray(rng.uniform(0, 50, (R, S)).astype(np.float32))
    t0 = jnp.asarray(np.cumsum(rng.uniform(0.01, 0.02, (R, S)), axis=1).astype(np.float32))
    t1 = t0 + 0.01
    mask = jnp.asarray(rng.uniform(size=(R, S)) > 0.3)

    w, trans = render_weights(sigmas, t0, t1, mask)
    w = np.asarray(w)

    # reference: alpha compositing with cumprod over valid samples only
    sig = np.asarray(sigmas) * np.asarray(mask)
    delta = np.asarray(t1 - t0)
    alpha = 1 - np.exp(-sig * delta)
    T = np.cumprod(np.concatenate([np.ones((R, 1)), 1 - alpha[:, :-1]], axis=1), axis=1)
    expected = T * alpha
    assert np.allclose(w, expected * np.asarray(mask), atol=1e-5)
    assert (w[~np.asarray(mask)] == 0).all()
    assert (w.sum(1) <= 1 + 1e-5).all()


def test_renderers():
    R, S = 2, 8
    sigmas = jnp.full((R, S), 1e4)  # opaque
    t0 = jnp.tile(jnp.arange(S, dtype=jnp.float32)[None] * 0.1 + 1.0, (R, 1))
    t1 = t0 + 0.1
    mask = jnp.ones((R, S), bool)
    w, _ = render_weights(sigmas, t0, t1, mask)
    rgbs = jnp.ones((R, S, 3)) * 0.25
    bg = jnp.ones((3,))
    rgb = np.asarray(render_rgb(w, rgbs, bg))
    assert np.allclose(rgb, 0.25, atol=1e-4)  # fully opaque -> no background
    depth = np.asarray(render_depth_expected(w, t0, t1))
    assert np.allclose(depth, 1.05, atol=1e-3)  # first sample's midpoint
    acc = np.asarray(render_accumulation(w))
    assert np.allclose(acc, 1.0, atol=1e-5)

    # empty rays -> background
    w0, _ = render_weights(jnp.zeros((R, S)), t0, t1, mask)
    rgb0 = np.asarray(render_rgb(w0, rgbs, bg))
    assert np.allclose(rgb0, 1.0, atol=1e-6)


def test_distortion_loss_matches_quadratic():
    rng = np.random.default_rng(5)
    R, S = 3, 32
    w = jnp.asarray(rng.uniform(0, 0.1, (R, S)).astype(np.float32))
    t0 = jnp.asarray(np.sort(rng.uniform(0, 1, (R, S)), axis=1).astype(np.float32))
    t1 = t0 + 0.01
    mask = jnp.asarray(rng.uniform(size=(R, S)) > 0.2)

    loss = float(distortion_loss(w, t0, t1, mask))
    per_ray = []
    for r in range(R):
        m = np.asarray(mask[r])
        wr = np.asarray(w[r]) * m
        mids = np.asarray((t0[r] + t1[r]) * 0.5)
        deltas = np.asarray(t1[r] - t0[r]) * m
        per_ray.append(float(distortion_loss_reference(
            jnp.asarray(wr), jnp.asarray(mids), jnp.asarray(deltas))))
    assert loss == pytest.approx(np.mean(per_ray), rel=1e-4)

    # ray_mask subsetting
    ray_mask = jnp.array([True, False, False])
    loss0 = float(distortion_loss(w, t0, t1, mask, ray_mask))
    assert loss0 == pytest.approx(per_ray[0], rel=1e-4)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_masked_rgb_loss():
    pred = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    gt = jnp.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    alpha = jnp.array([0.9, 0.1])
    # unmasked: mean over all 6 elements = 0.5
    assert float(masked_rgb_loss(pred, gt, alpha, False, 0.5)) == pytest.approx(0.5)
    # masked (alpha > 0.5): only ray 0 -> loss 1.0
    assert float(masked_rgb_loss(pred, gt, alpha, True, 0.5)) == pytest.approx(1.0)


def test_alpha_loss():
    acc = jnp.array([[0.8], [0.3], [0.5]])
    alpha = jnp.array([1.0, 0.0, 0.5])  # ray 0 is pure foreground -> excluded
    expected = (abs(0.3 - 0.0) + abs(0.5 - 0.5)) / 2
    assert float(alpha_loss(acc, alpha)) == pytest.approx(expected)


def test_empty_and_near_loss():
    R, S = 1, 4
    t0 = jnp.array([[0.1, 0.2, 0.3, 0.4]])
    t1 = t0 + 0.1
    mask = jnp.ones((R, S), bool)
    w = jnp.array([[0.1, 0.2, 0.3, 0.1]])
    depth = jnp.array([0.5])  # mids: 0.15,0.25,0.35,0.45
    eps = 0.15
    # empty: mids < 0.35 -> samples 0,1 -> mean(w^2)
    el = float(empty_loss(w, t0, t1, mask, depth, eps))
    assert el == pytest.approx((0.1 ** 2 + 0.2 ** 2) / 2)
    # near: |mid - 0.5| <= 0.15 -> samples 2 (0.35) and 3 (0.45)
    nl = float(near_loss(w, t0, t1, mask, depth, eps))
    import scipy.stats as st
    std = (eps / 3) ** 2
    cum = np.cumsum(np.asarray(w[0]))
    exp2 = st.norm.cdf((0.35 - 0.5) / std)
    exp3 = st.norm.cdf((0.45 - 0.5) / std)
    expected = ((cum[2] - exp2) ** 2 + (cum[3] - exp3) ** 2) / 2
    assert nl == pytest.approx(expected, rel=1e-4)
    # invalid depth -> zero losses
    assert float(empty_loss(w, t0, t1, mask, jnp.zeros(1), eps)) == 0.0
    assert float(near_loss(w, t0, t1, mask, jnp.zeros(1), eps)) == 0.0


def test_depth_loss():
    pred = jnp.array([[0.5], [1.0]])
    gt = jnp.array([0.7, 0.0])  # second ray invalid
    assert float(depth_loss(pred, gt)) == pytest.approx(0.04)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def test_ray_aabb_intersect():
    aabb_min = jnp.array([-1.0, -1.0, -1.0])
    aabb_max = jnp.array([1.0, 1.0, 1.0])
    o = jnp.array([[-5.0, 0.0, 0.0], [0.0, 0.0, 5.0], [5.0, 5.0, 5.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    t_near, t_far = ray_aabb_intersect(o, d, aabb_min, aabb_max)
    assert np.allclose(np.asarray(t_near)[:2], [4.0, 4.0], atol=1e-5)
    assert np.allclose(np.asarray(t_far)[:2], [6.0, 6.0], atol=1e-5)
    assert float(t_near[2]) > float(t_far[2])  # miss


def test_occupied_world_aabb():
    from nersemble_tpu.ops.sampling import occupied_world_aabb

    aabb_min = jnp.zeros(3)
    aabb_max = jnp.ones(3) * 4  # 4x4x4 grid => cell = 1.0
    binaries = jnp.zeros((4, 4, 4), bool).at[1, 2, 3].set(True)
    lo, hi, any_occ = occupied_world_aabb(binaries, aabb_min, aabb_max,
                                          expand_cells=2.0)
    assert bool(any_occ)
    # occupied cell spans [1,2]x[2,3]x[3,4]; expanded by 2 cells per side
    assert np.allclose(np.asarray(lo), [-1.0, 0.0, 1.0], atol=1e-5)
    assert np.allclose(np.asarray(hi), [4.0, 5.0, 6.0], atol=1e-5)

    _, _, none_occ = occupied_world_aabb(jnp.zeros((4, 4, 4), bool),
                                         aabb_min, aabb_max)
    assert not bool(none_occ)

    # cascade: level 1 covers the base box scaled 2x about its center
    # (cell = 2.0); union of both levels' expanded boxes
    casc = jnp.zeros((2, 4, 4, 4), bool).at[0, 1, 2, 3].set(True) \
        .at[1, 0, 0, 0].set(True)
    lo, hi, any_occ = occupied_world_aabb(casc, aabb_min, aabb_max,
                                          expand_cells=1.0)
    assert bool(any_occ)
    # level-1 box spans [-2, 6]; its occupied cell [0,0,0] spans [-2, 0]
    # per axis, expanded by 1 level-1 cell (2.0) => [-4, 2]
    # level-0 cell expanded by 1 cell => [0,3]x[1,4]x[2,5]
    assert np.allclose(np.asarray(lo), [-4.0, -4.0, -4.0], atol=1e-5)
    assert np.allclose(np.asarray(hi), [3.0, 4.0, 5.0], atol=1e-5)


def test_occupancy_lookup():
    binaries = jnp.zeros((4, 4, 4), bool).at[0, 0, 0].set(True).at[3, 3, 3].set(True)
    aabb_min = jnp.zeros(3)
    aabb_max = jnp.ones(3) * 4
    pts = jnp.array([[0.5, 0.5, 0.5], [3.5, 3.5, 3.5], [1.5, 0.5, 0.5],
                     [-1.0, 0.0, 0.0]])
    occ = np.asarray(occupancy_lookup(binaries, pts, aabb_min, aabb_max))
    assert occ.tolist() == [True, True, False, False]


def test_march_rays_dense_and_compaction():
    aabb_min = jnp.array([0.0, 0.0, 0.0])
    aabb_max = jnp.array([1.0, 1.0, 1.0])
    o = jnp.array([[-1.0, 0.5, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    step = 0.1
    samples, info = march_rays(o, d, aabb_min, aabb_max, step,
                               n_candidates=32, max_samples_per_ray=16)
    # ray crosses [1.0, 2.0]: 10 samples of width 0.1
    n = int(info["n_samples_per_ray"][0])
    assert n == 10
    t0 = np.asarray(samples.t_starts[0])[:n]
    assert np.allclose(t0, 1.0 + np.arange(10) * step, atol=1e-5)
    assert np.all(np.diff(t0) > 0)  # ascending after compaction

    # occupancy: only x in [0.5, 1.0] occupied -> half the samples survive
    binaries = jnp.zeros((2, 2, 2), bool).at[1, :, :].set(True)
    samples2, info2 = march_rays(o, d, aabb_min, aabb_max, step,
                                 n_candidates=32, max_samples_per_ray=16,
                                 binaries=binaries)
    n2 = int(info2["n_samples_per_ray"][0])
    assert n2 == 5
    mids = np.asarray((samples2.t_starts + samples2.t_ends)[0] * 0.5)[:n2]
    assert (mids > 1.5).all()  # world x > 0.5 along the ray

    # overflow accounting
    samples3, info3 = march_rays(o, d, aabb_min, aabb_max, step,
                                 n_candidates=32, max_samples_per_ray=4)
    assert int(info3["n_samples_per_ray"][0]) == 4
    assert int(info3["n_dropped_per_ray"][0]) == 6


def test_march_rays_jitter_stratified():
    aabb_min = jnp.zeros(3)
    aabb_max = jnp.ones(3)
    o = jnp.array([[-1.0, 0.5, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    jitter = jnp.array([0.5])
    samples, _ = march_rays(o, d, aabb_min, aabb_max, 0.1, 16, 8, jitter=jitter)
    assert float(samples.t_starts[0, 0]) == pytest.approx(1.05, abs=1e-5)


def test_cone_march_matches_sequential_recurrence():
    """Closed-form cone comb == nerfacc's t += max(t*cone, dt) recurrence."""
    from nersemble_tpu.ops.sampling import cone_march_ts

    dt, cone = 0.05, 0.08
    for t_near in (0.0, 0.2, 1.5):  # linear phase, mixed, pure geometric
        ts_oracle, t = [], t_near
        for _ in range(24):
            ts_oracle.append(t)
            t += max(t * cone, dt)
        ts_oracle.append(t)
        ts = cone_march_ts(jnp.array([t_near]),
                           jnp.arange(25, dtype=jnp.float32)[None, :], dt, cone)
        np.testing.assert_allclose(np.asarray(ts[0]), ts_oracle,
                                   rtol=1e-5, atol=1e-6)


def test_march_rays_cone_angle_growing_steps():
    aabb_min = jnp.zeros(3)
    aabb_max = jnp.ones(3) * 8
    o = jnp.array([[-0.5, 4.0, 4.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    samples, info = march_rays(o, d, aabb_min, aabb_max, 0.05, 256, 128,
                               cone_angle=0.1)
    n = int(info["n_samples_per_ray"][0])
    widths = np.asarray(samples.t_ends - samples.t_starts)[0][:n]
    assert n < 128  # far fewer steps than 8.5/0.05 = 170 uniform
    assert widths[0] == pytest.approx(0.05, abs=1e-6)  # near: dt_min
    assert widths[-1] > 0.2  # far: grown
    assert np.all(np.diff(widths) >= -1e-6)  # monotone non-decreasing
    # intervals tile the ray exactly (t_end[i] == t_start[i+1])
    t0 = np.asarray(samples.t_starts[0])[:n]
    t1 = np.asarray(samples.t_ends[0])[:n]
    np.testing.assert_allclose(t1[:-1], t0[1:], rtol=1e-5)


@pytest.mark.parametrize("budget_mode", ["under", "exact", "over"])
def test_compact_samples_monotone_matches_sort(budget_mode):
    """Staircase compaction == sort-based compaction on prefix masks.

    Exact kept-set equality when the budget covers all valid samples (the
    adaptive-budget steady state); on overflow, per-slot kept COUNTS match
    (both drop the far tail slot-major — only the arbitrary choice within
    the boundary slot differs)."""
    from nersemble_tpu.ops.sampling import (compact_samples,
                                            compact_samples_monotone)

    R, S = 64, 16
    rng = np.random.default_rng(3)
    n = rng.integers(0, S + 1, R)  # incl. empty and full rays
    mask = jnp.asarray(np.arange(S)[None, :] < n[:, None])
    total = int(n.sum())
    budget = {"under": max(total // 2, 1), "exact": total,
              "over": min(total + 37, R * S)}[budget_mode]

    sel_m, kept_m = jax.jit(compact_samples_monotone,
                            static_argnums=1)(mask, budget)
    sel_s, _, _, kept_s = compact_samples(mask, budget)
    sel_m, kept_m = np.asarray(sel_m), np.asarray(kept_m)
    kept_s = np.asarray(kept_s)

    # sel is duplicate-free (scatter_rows_back requirement), incl. padding
    assert len(np.unique(sel_m)) == budget
    assert sel_m.min() >= 0 and sel_m.max() < R * S
    # same number kept, and the same per-slot counts as the sort version
    assert kept_m.sum() == kept_s.sum() == min(total, budget)
    np.testing.assert_array_equal(kept_m.sum(0), kept_s.sum(0))
    # the valid prefix of sel is exactly the kept set (as a set)
    kept_flat = np.flatnonzero(kept_m.T.reshape(-1))  # slot-major positions
    valid_sel = sel_m[:min(total, budget)]
    assert set(valid_sel.tolist()) == set(kept_flat.tolist())
    if budget >= total:
        np.testing.assert_array_equal(kept_m, np.asarray(mask))
        np.testing.assert_array_equal(kept_m, kept_s)


def test_compact_samples_monotone_degenerate_masks():
    from nersemble_tpu.ops.sampling import compact_samples_monotone

    R, S = 8, 4
    # all-empty mask: every sel entry is padding, still duplicate-free
    sel, kept = compact_samples_monotone(jnp.zeros((R, S), bool), 16)
    assert len(np.unique(np.asarray(sel))) == 16
    assert not np.asarray(kept).any()
    # all-full mask with budget == R*S: identity cover
    sel, kept = compact_samples_monotone(jnp.ones((R, S), bool), R * S)
    assert np.asarray(kept).all()
    assert set(np.asarray(sel).tolist()) == set(range(R * S))


def test_occupancy_lookup_multilevel_cascade():
    """[L,G,G,G] cascade: finest containing level wins; coarse levels extend
    coverage beyond the base box (level l = base box scaled by 2^l)."""
    G = 4
    aabb_min, aabb_max = jnp.zeros(3), jnp.ones(3) * 4  # level-1 box: [-2, 6]
    binaries = jnp.zeros((2, G, G, G), bool)
    binaries = binaries.at[1].set(True)           # coarse level all occupied
    binaries = binaries.at[0, 0, 0, 0].set(True)  # fine level: one cell
    pts = jnp.array([
        [0.5, 0.5, 0.5],    # inside base, fine cell occupied -> True
        [3.5, 3.5, 3.5],    # inside base, fine cell empty -> False (fine wins)
        [-1.0, 0.0, 0.0],   # outside base, inside level 1 -> True
        [-3.0, 0.0, 0.0],   # outside every level -> False
    ])
    occ = np.asarray(occupancy_lookup(binaries, pts, aabb_min, aabb_max))
    assert occ.tolist() == [True, False, True, False]
    # single-level [1,G,G,G] reduces to the [G,G,G] behavior
    occ1 = np.asarray(occupancy_lookup(binaries[:1], pts, aabb_min, aabb_max))
    occ3 = np.asarray(occupancy_lookup(binaries[0], pts, aabb_min, aabb_max))
    assert occ1.tolist() == occ3.tolist()


# ---------------------------------------------------------------------------
# Occupancy grid updates
# ---------------------------------------------------------------------------

def test_occupancy_update_and_binaries():
    from nersemble_tpu.ops.occupancy import (
        occupancy_binaries,
        update_occupancy_grid,
    )

    G = 8
    aabb_min = jnp.zeros(3)
    aabb_max = jnp.ones(3)
    occs = jnp.zeros(G ** 3)

    def occ_eval_fn(positions, rng):
        # density high in the x > 0.5 half
        return jnp.where(positions[:, 0] > 0.5, 1.0, 0.0)

    occs = update_occupancy_grid(occs, occ_eval_fn, jax.random.PRNGKey(0),
                                 G, aabb_min, aabb_max, occ_thre=1e-2,
                                 ema_decay=0.95, warmup=True)
    binaries = np.asarray(occupancy_binaries(occs, 1e-2)).reshape(G, G, G)
    assert binaries[G // 2 + 1:, :, :].all()
    assert not binaries[:G // 2 - 1, :, :].any()

    # EMA decay: a cell that goes empty decays multiplicatively
    occs2 = update_occupancy_grid(occs, lambda p, r: jnp.zeros(p.shape[0]),
                                  jax.random.PRNGKey(1), G, aabb_min, aabb_max,
                                  occ_thre=1e-2, ema_decay=0.5, warmup=True)
    assert np.allclose(np.asarray(occs2), np.asarray(occs) * 0.5)

    # sampled (non-warmup) update compiles and keeps shape
    occs3 = update_occupancy_grid(occs, occ_eval_fn, jax.random.PRNGKey(2),
                                  G, aabb_min, aabb_max, occ_thre=1e-2,
                                  ema_decay=0.95, warmup=False)
    assert occs3.shape == occs.shape

    # frustum grid ANDed in
    frustum = np.zeros((G, G, G), bool)
    frustum[0] = True
    b2 = np.asarray(occupancy_binaries(occs, 1e-2, jnp.asarray(frustum)))
    assert not b2[1:].any()


@pytest.mark.slow
def test_blended_custom_vjp_matches_autodiff(small_levels):
    """The custom-VJP blended encode == plain autodiff (values + all grads),
    end-to-end through the canonical-table quad build (tests the roll-back
    gradient fold too)."""
    from nersemble_tpu.ops.hash_encoding import (
        build_quad_table,
        hash_encode_blended,
        hash_encode_blended_reference,
        init_hash_table,
    )

    H, Fl = 4, 2
    table = init_hash_table(jax.random.PRNGKey(0), small_levels,
                            row_width=H * Fl)
    N = 23
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=0.05,
                           maxval=0.95)
    code = jax.random.normal(jax.random.PRNGKey(2), (N, H))
    g_out = jax.random.normal(jax.random.PRNGKey(3), (N, 6 * Fl))

    def run(fn, t, xx, c):
        quad = build_quad_table(t, small_levels, dtype=jnp.float32)
        out = fn(quad, xx, c, small_levels, features_per_logical=Fl)
        return jnp.sum(out * g_out), out

    (loss_c, out_c), grads_c = jax.value_and_grad(
        lambda t, xx, c: run(hash_encode_blended, t, xx, c),
        argnums=(0, 1, 2), has_aux=True)(table, x, code)
    (loss_r, out_r), grads_r = jax.value_and_grad(
        lambda t, xx, c: run(hash_encode_blended_reference, t, xx, c),
        argnums=(0, 1, 2), has_aux=True)(table, x, code)

    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)
    assert float(loss_c) == pytest.approx(float(loss_r), rel=1e-5)
    for name, gc, gr in zip(("table", "x", "code"), grads_c, grads_r):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


def test_hash_encode_matches_clamped_trilerp_interior():
    """Independent oracle (ADVICE r2): a tcnn-style CLAMPED-corner trilinear
    interpolation, written without any knowledge of the xz-quad layout. On
    interior points of dense levels (no clamp, no wrap) the two semantics
    agree exactly, guarding the quad/grid layout against regressions
    independently of the mirrored-semantics _naive_hash_encode oracle."""
    levels = HashGridLevels.create(n_levels=3, log2_hashmap_size=19,
                                   base_resolution=4, per_level_scale=1.5)
    assert not any(levels.hashed)  # dense-only on purpose
    table = np.asarray(init_hash_table(jax.random.PRNGKey(5), levels, 4))
    # interior points: floor(x*scale + 0.5) in [0, res-2] for every level
    x = np.random.default_rng(7).uniform(0.1, 0.8, size=(23, 3)) \
        .astype(np.float32)

    out = np.asarray(hash_encode(
        build_quad_table(jnp.asarray(table), levels, dtype=jnp.float32),
        jnp.asarray(x), levels))

    N, W = x.shape[0], table.shape[1]
    ref = np.zeros((N, levels.n_levels, W), np.float32)
    for l in range(levels.n_levels):
        res = levels.resolutions[l]
        sx, sz = levels.x_strides[l], levels.z_strides[l]
        pos = x * levels.scales[l] + 0.5
        g0 = np.floor(pos).astype(np.int64)
        frac = pos - g0
        assert (g0 >= 0).all() and (g0 <= res - 2).all(), "not interior"
        for a in (0, 1):
            for b in (0, 1):
                for c in (0, 1):
                    cx = np.clip(g0[:, 0] + a, 0, res - 1)
                    cy = np.clip(g0[:, 1] + b, 0, res - 1)
                    cz = np.clip(g0[:, 2] + c, 0, res - 1)
                    idx = levels.offsets[l] + cy + sx * cx + sz * cz
                    w = (frac[:, 0] if a else 1 - frac[:, 0]) \
                        * (frac[:, 1] if b else 1 - frac[:, 1]) \
                        * (frac[:, 2] if c else 1 - frac[:, 2])
                    ref[:, l] += w[:, None] * table[idx]
    np.testing.assert_allclose(out, ref.reshape(N, -1), atol=1e-5)


@pytest.mark.slow
def test_hot_entry_scatter_accumulates_f32(small_levels):
    """Hot-entry table gradients survive bf16 production mode (ADVICE r2):
    dense coarse levels accumulate thousands of scattered rows per entry —
    pure-bf16 accumulation rounds late contributions to zero once the
    running sum exceeds ~256x an increment. The backward splits the scatter:
    dense prefix in f32, hashed levels in the table dtype."""
    from nersemble_tpu.ops.hash_encoding import (
        dense_split,
        hash_encode_blended_reference,
    )

    levels = small_levels
    D, E_dense = dense_split(levels)
    assert 0 < D < levels.n_levels  # mixed dense/hashed split exercised
    table = init_hash_table(jax.random.PRNGKey(0), levels, 8)  # H=4, Fl=2
    N = 8192
    # hot workload: every sample inside one tiny region => coarse-level rows
    # all land on a handful of entries
    x = 0.3 + 0.02 * jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    code = jax.random.uniform(jax.random.PRNGKey(2), (N, 4))
    quad16 = build_quad_table(table, levels, dtype=jnp.bfloat16)
    quad32 = build_quad_table(table, levels, dtype=jnp.float32)

    g16 = jax.grad(lambda q: jnp.sum(
        hash_encode_blended(q, x, code, levels, 2)))(quad16)
    g32 = jax.grad(lambda q: jnp.sum(
        hash_encode_blended_reference(q, x, code, levels, 2)))(quad32)
    g16 = np.asarray(g16, np.float32)
    g32 = np.asarray(g32, np.float32)

    # d_table is independent of the table VALUES (linear in blend weights),
    # so bf16 vs f32 here isolates expansion/accumulation precision. The
    # dense prefix must retain its gradient mass; a pure-bf16 accumulation
    # loses tens of percent on this workload (the hashed levels, still bf16,
    # measurably do on this same pathological all-in-one-cell input — which
    # is why this assertion is a real regression guard).
    mass16 = np.abs(g16[:E_dense]).sum()
    mass32 = np.abs(g32[:E_dense]).sum()
    assert abs(mass16 / mass32 - 1.0) < 0.02, (mass16, mass32)

    # realistic fill for the hashed levels (samples spread over the volume,
    # a few rows per entry — the production regime): bf16 accumulation there
    # stays accurate, justifying the hot/cold split
    xs = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))
    g16s = np.asarray(jax.grad(lambda q: jnp.sum(
        hash_encode_blended(q, xs, code, levels, 2)))(quad16), np.float32)
    g32s = np.asarray(jax.grad(lambda q: jnp.sum(
        hash_encode_blended_reference(q, xs, code, levels, 2)))(quad32),
        np.float32)
    hmass16 = np.abs(g16s[E_dense:]).sum()
    hmass32 = np.abs(g32s[E_dense:]).sum()
    assert abs(hmass16 / hmass32 - 1.0) < 0.03, (hmass16, hmass32)


def test_quad_pallas_build_and_fold_match_xla():
    """Pallas quad build/fold (interpreter) == the XLA roll/concat path.

    The fixture has both a padded dense level and hashed levels (hashed size
    2^12 = exactly one BLOCK), so the block metadata covers wrap-around
    windows and multi-block levels. Copies are exact in any dtype.
    """
    from nersemble_tpu.ops.hash_encoding import _quad_bwd_xla, _quad_fwd_xla

    lv = HashGridLevels.create(n_levels=6, log2_hashmap_size=12,
                               base_resolution=4, per_level_scale=1.5)
    assert any(lv.hashed) and not all(lv.hashed)
    assert all(s % quad_pallas.BLOCK == 0 for s in lv.sizes)
    rng = np.random.default_rng(0)
    w = 8
    table = jnp.asarray(
        rng.standard_normal((lv.total_entries, w)).astype(np.float32)
    ).astype(jnp.bfloat16)
    g = jnp.asarray(
        rng.standard_normal((lv.total_entries, 4 * w)).astype(np.float32)
    ).astype(jnp.bfloat16)

    old = quad_pallas.INTERPRET
    quad_pallas.INTERPRET = True
    try:
        assert quad_pallas.available(lv, w)
        built = np.asarray(quad_pallas.build(table, lv))
        folded = np.asarray(quad_pallas.fold(g, lv))
    finally:
        quad_pallas.INTERPRET = old

    np.testing.assert_array_equal(built, np.asarray(_quad_fwd_xla(table, lv)))
    np.testing.assert_array_equal(folded, np.asarray(_quad_bwd_xla(g, lv)))


def test_quad_pallas_unaligned_levels_fall_back():
    # log2_hashmap_size 9 => hashed size 512 < BLOCK: kernels must not apply
    lv = HashGridLevels.create(n_levels=4, log2_hashmap_size=9,
                               base_resolution=16)
    old = quad_pallas.INTERPRET
    quad_pallas.INTERPRET = True
    try:
        assert not quad_pallas.available(lv, 8)
    finally:
        quad_pallas.INTERPRET = old
