"""Vendored FovVideoVDP-class JOD metric (utils/fvvdp.py).

The real pyfvvdp is absent from this image; the vendored pipeline must be
perfect-score-exact on identical inputs, monotone in distortion strength,
and slot into the eval CLI's evaluator resolution (utils/jod.py).
"""

import numpy as np
import pytest

from nersemble_tpu.utils.fvvdp import (
    DisplayModel,
    VendoredFovVideoVDP,
)


def _make_video(T=6, H=96, W=128):
    ys, xs = np.mgrid[0:H, 0:W]
    ref = np.zeros((T, H, W, 3), np.float32)
    for t in range(T):
        blob = np.exp(-(((xs - 50 - 5 * t) / 20.0) ** 2
                        + ((ys - 45) / 20.0) ** 2))
        tex = 0.5 + 0.4 * np.sin(xs * 0.4) * np.sin(ys * 0.35)
        ref[t, ..., 0] = blob * tex
        ref[t, ..., 1] = blob * tex * 0.7
        ref[t, ..., 2] = blob * 0.4
    return (ref * 255).astype(np.uint8), ref


def test_display_geometry():
    d = DisplayModel()
    ppd = d.pixels_per_degree()
    # a 4k 30" panel at 0.6 m is ~60-90 pixels/degree
    assert 50 < ppd < 110
    lum = d.to_luminance(np.array([[0.0], [0.5], [1.0]]))[:, 0]
    assert lum[0] == pytest.approx(d.peak_luminance / d.contrast)
    assert lum[2] == pytest.approx(d.peak_luminance)
    assert lum[0] < lum[1] < lum[2]
    # RGB triplets collapse to luminance (Rec.709 weights)
    rgb = d.to_luminance(np.array([[[1.0, 1.0, 1.0]]]))
    assert rgb[0, 0] == pytest.approx(d.peak_luminance)


def test_identical_is_ten_and_noise_monotone():
    ref8, ref = _make_video()
    m = VendoredFovVideoVDP()
    jod, _ = m.predict(ref8, ref8, dim_order="FHWC", frames_per_second=24.0)
    assert float(jod) == pytest.approx(10.0)

    rng = np.random.default_rng(0)
    scores = []
    for sigma in (0.002, 0.01, 0.05):
        noisy = np.clip(ref + rng.normal(0, sigma, ref.shape), 0, 1)
        jod, _ = m.predict((noisy * 255).astype(np.uint8), ref8,
                           dim_order="FHWC", frames_per_second=24.0)
        scores.append(float(jod))
    # monotone in distortion; absolute anchoring is pinned separately by
    # test_jod_calibration_anchor (noise on this video's BLACK background is
    # harshly penalized — tiny adaptation luminance inflates contrast —
    # so thresholds here are loose on purpose)
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 8.5  # quantization-level noise stays near-perfect
    assert scores[-1] < 6.0  # strong noise clearly penalized


def test_jod_calibration_anchor():
    """The fitted regression (scripts/calibrate_jod.py) puts a blur+noise
    distortion at PSNR ~31.5 near the reference's published anchor — the
    official PSNR 31.48 <-> JOD 7.85 pair (reference README.md:159-166).
    Pre-calibration the same distortion class scored ~2.75 (VERDICT r3 #4)."""
    from scripts.calibrate_jod import blur_stack, make_frames, psnr

    ref = make_frames(256, 352, 4)  # calibration resolution (6-level regime)
    test = blur_stack(ref, 6.5, 0.025)  # ~PSNR 31.8 at this scale
    p = psnr(test, ref)
    assert 30.0 < p < 34.0
    m = VendoredFovVideoVDP()
    jod, _ = m.predict(test, ref, dim_order="FHWC", frames_per_second=24.0)
    assert 7.3 < float(jod) < 8.6, float(jod)


def test_single_frame_image_mode():
    ref8, ref = _make_video(T=1)
    m = VendoredFovVideoVDP()
    jod, _ = m.predict(ref8, ref8, dim_order="FHWC", frames_per_second=24.0)
    assert float(jod) == pytest.approx(10.0)
    blurry = ref8.astype(np.float32)
    blurry[..., :] = blurry.mean(axis=(1, 2), keepdims=True)
    jod2, _ = m.predict(blurry.astype(np.uint8), ref8, dim_order="FHWC",
                        frames_per_second=24.0)
    assert float(jod2) < float(jod)


def test_evaluator_resolution(monkeypatch):
    """utils/jod.py resolves: pyfvvdp (absent here) -> vendored -> None
    (opt-out env)."""
    from nersemble_tpu.utils import jod as jod_mod

    jod_mod.set_jod_evaluator_factory(None)
    ev = jod_mod.get_jod_evaluator()
    assert ev is not None and getattr(ev, "vendored", False)

    jod_mod.set_jod_evaluator_factory(None)  # reset cache
    monkeypatch.setenv("NERSEMBLE_DISABLE_VENDORED_JOD", "1")
    assert jod_mod.get_jod_evaluator() is None
    jod_mod.set_jod_evaluator_factory(None)


def test_jod_score_helper_uses_vendored():
    from nersemble_tpu.utils import jod as jod_mod

    jod_mod.set_jod_evaluator_factory(None)
    ev = jod_mod.get_jod_evaluator()
    ref8, _ = _make_video(T=4)
    score = jod_mod.jod_score(ev, ref8, ref8, fps=10.0)
    assert score == pytest.approx(10.0)
    jod_mod.set_jod_evaluator_factory(None)
