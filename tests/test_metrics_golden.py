"""Golden-value tests for the headline metrics stack.

- SSIM vs an independent scipy implementation of Wang et al. with
  crop-to-valid semantics (what skimage/torchmetrics compute for
  gaussian_kernel=True, sigma=1.5, k=11 — SURVEY.md section 7 flags metric
  parity as a hard part, so the oracle is a fully separate code path).
- LPIPS (utils/lpips.py) executed end-to-end with synthetic VGG-16-shaped
  weights against a torch oracle that mirrors the ``lpips`` package math.
- uint8 alpha blending vs the reference's quantization behavior.
- JOD evaluation fps arithmetic (reference: evaluate_nersemble.py:206-214).
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------

def _ssim_oracle(pred, target, data_range=1.0, size=11, sigma=1.5,
                 k1=0.01, k2=0.03):
    """Independent numpy/scipy SSIM: explicit gaussian correlation per
    channel, crop to valid region, Wang et al. formula."""
    from scipy.ndimage import correlate

    coords = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    kern = np.outer(g, g)
    pad = (size - 1) // 2

    def filt(img):
        out = np.stack([correlate(img[..., c], kern, mode="constant")
                        for c in range(img.shape[-1])], -1)
        return out[pad:-pad, pad:-pad]  # interior == valid conv

    pred = pred.astype(np.float64)
    target = target.astype(np.float64)
    mu_x, mu_y = filt(pred), filt(target)
    sxx = filt(pred * pred) - mu_x ** 2
    syy = filt(target * target) - mu_y ** 2
    sxy = filt(pred * target) - mu_x * mu_y
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
    return float(np.mean(num / den))


@pytest.mark.parametrize("seed,blur", [(0, False), (1, True), (2, False)])
def test_ssim_matches_independent_oracle(seed, blur):
    import jax.numpy as jnp
    from nersemble_tpu.utils.metrics import ssim

    rng = np.random.default_rng(seed)
    gt = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    if blur:
        from scipy.ndimage import gaussian_filter
        pred = gaussian_filter(gt, (1.0, 1.0, 0))  # structurally similar
    else:
        pred = np.clip(gt + rng.normal(0, 0.08, gt.shape), 0, 1) \
            .astype(np.float32)
    ours = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
    ref = _ssim_oracle(pred, gt)
    assert ours == pytest.approx(ref, abs=1e-4)


def test_ssim_identical_images_is_one():
    import jax.numpy as jnp
    from nersemble_tpu.utils.metrics import ssim
    img = jnp.asarray(np.random.default_rng(3).uniform(size=(32, 32, 3)),
                      jnp.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_never_exceeds_one_under_cancellation():
    """SSIM <= 1 even where the f32 mu_xx - mu_x**2 cancellation breaks the
    moment inequalities (a quality-run eval once logged ssim 1.0014; an
    unprojected formulation measures 1.058 on this fixture)."""
    import jax.numpy as jnp
    from nersemble_tpu.utils.metrics import ssim

    rng = np.random.default_rng(4)
    flat = np.full((64, 64, 3), 37.0, np.float32)
    noisy = flat + rng.normal(0, 1e-3, flat.shape).astype(np.float32)
    val = float(ssim(jnp.asarray(flat), jnp.asarray(noisy)))
    assert val <= 1.0 + 1e-6, val
    assert val >= 0.5  # still reads as 'nearly identical', not clamped junk


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

def _make_synthetic_vgg_weights(rng):
    """Random VGG-16-shaped conv weights + LPIPS linear heads (small scale so
    activations stay finite)."""
    convs = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
             10: (256, 128), 12: (256, 256), 14: (256, 256),
             17: (512, 256), 19: (512, 512), 21: (512, 512),
             24: (512, 512), 26: (512, 512), 28: (512, 512)}
    weights = {}
    for i, (o, c) in convs.items():
        weights[f"features.{i}.weight"] = \
            rng.normal(0, 0.05, (o, c, 3, 3)).astype(np.float32)
        weights[f"features.{i}.bias"] = \
            rng.normal(0, 0.01, (o,)).astype(np.float32)
    for k, c in enumerate((64, 128, 256, 512, 512)):
        weights[f"lin{k}.model.1.weight"] = \
            rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32)
    return weights


def _lpips_torch_oracle(weights, pred, target):
    """Mirror of the ``lpips`` package forward in torch (independent of the
    JAX implementation under test)."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
        x = (x * 2.0 - 1.0 - shift) / scale
        taps = []
        for i in range(30):
            wkey = f"features.{i}.weight"
            if wkey in weights:
                x = F.conv2d(x, torch.from_numpy(weights[wkey]),
                             torch.from_numpy(weights[f"features.{i}.bias"]),
                             padding=1)
            elif i in (4, 9, 16, 23):
                x = F.max_pool2d(x, 2, 2)
            else:
                x = F.relu(x)
            if i in (3, 8, 15, 22, 29):
                taps.append(x)
        return taps

    fx, fy = feats(pred), feats(target)
    total = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
        b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
        lin = torch.from_numpy(weights[f"lin{k}.model.1.weight"])
        total += float(F.conv2d((a - b) ** 2, lin).mean())
    return total


def test_lpips_executes_and_matches_torch_oracle(tmp_path, monkeypatch):
    from nersemble_tpu.utils.lpips import (lpips_available, lpips_or_none,
                                           reset_lpips_cache)

    rng = np.random.default_rng(0)
    weights = _make_synthetic_vgg_weights(rng)
    path = tmp_path / "fake_vgg.npz"
    np.savez(path, **weights)
    monkeypatch.setenv("NERSEMBLE_LPIPS_WEIGHTS", str(path))
    reset_lpips_cache()
    try:
        assert lpips_available()
        pred = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        target = np.clip(pred + rng.normal(0, 0.1, pred.shape), 0, 1) \
            .astype(np.float32)
        ours = lpips_or_none(pred, target)
        assert ours is not None
        ref = _lpips_torch_oracle(weights, pred, target)
        assert ours == pytest.approx(ref, rel=2e-3, abs=1e-5)
        assert lpips_or_none(pred, pred) == pytest.approx(0.0, abs=1e-6)
    finally:
        reset_lpips_cache()


def test_lpips_none_without_weights(monkeypatch):
    from nersemble_tpu.utils.lpips import lpips_or_none, reset_lpips_cache
    monkeypatch.delenv("NERSEMBLE_LPIPS_WEIGHTS", raising=False)
    reset_lpips_cache()
    img = np.zeros((8, 8, 3), np.float32)
    assert lpips_or_none(img, img) is None
    reset_lpips_cache()


# ---------------------------------------------------------------------------
# uint8 alpha blending + JOD fps
# ---------------------------------------------------------------------------

def test_perform_alpha_blending_uint8_quantization():
    from nersemble_tpu.utils.metrics import perform_alpha_blending
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    out = perform_alpha_blending(img, alpha)
    assert out.dtype == np.uint8
    # reference formula, elementwise (evaluate_nersemble.py:22-35)
    a = (alpha / 255.0)[..., None]
    expected = np.clip((a * (img / 255.0) + (1 - a)) * 255.0, 0, 255) \
        .astype(np.uint8)
    np.testing.assert_array_equal(out, expected)
    # fully opaque alpha keeps the image bit-exact
    np.testing.assert_array_equal(
        perform_alpha_blending(img, np.full_like(alpha, 255)), img)
    # fully transparent -> white background
    assert perform_alpha_blending(img, np.zeros_like(alpha)).min() == 255


def test_jod_evaluation_fps():
    from nersemble_tpu.utils.jod import evaluation_fps
    # plain: 73 fps capture, no skips, max_eval 15 of 100 timesteps
    assert evaluation_fps(1, 100, 15, None) == pytest.approx(73 / (100 / 15))
    # --skip_timesteps 3 mode (reference README JOD protocol)
    assert evaluation_fps(1, 100, -1, 3) == pytest.approx(73 / 3)
    # dataparser-level frame skip compounds
    assert evaluation_fps(2, 100, -1, 3) == pytest.approx(73 / 2 / 3)
