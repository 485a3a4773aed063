"""Calibrate the vendored JOD regression against the published anchor.

VERDICT r3 #5: the vendored FovVideoVDP pipeline (utils/fvvdp.py) executed
end-to-end but its hand-set JOD regression put a decent model at 2.75 where
the reference scale puts good models at ~7.85 — internally comparable,
catastrophic-looking next to reference numbers.

pyfvvdp's fitted parameter file is unavailable offline, so this calibrates
the two free regression constants (jod = 10 - jod_a * Q^jod_exp) against the
one HARD published anchor plus interpolated targets:

- HARD: the reference's official metrics (/root/reference/README.md:159-166)
  pair PSNR 31.48 with JOD 7.85 on the same renders — one (distortion
  level -> JOD) correspondence for NeRF-like (blur-dominant) artifacts.
- HARD (by construction): an identical test/reference pair scores JOD 10
  exactly — FovVideoVDP's scale definition (10 = imperceptible difference);
  the power-law form 10 - a*Q^e passes through it for any (a, e).
- DERIVED: the NeRSemble paper's baseline table spans roughly 0.2 JOD per dB
  of PSNR around that anchor (weaker baselines: lower PSNR, proportionally
  lower JOD), and JOD 10 is pinned to the identical pair by construction.
  Targets at other PSNRs are linear in PSNR through the anchor with that
  slope, clamped to (0, 10). They are interpolations, not transcriptions —
  documented in STATUS.md.

VERDICT r4 #9 asked for 2-3 TRANSCRIBED published distortion-level JODs to
replace the asserted slope. Honest finding: that is not possible in this
environment — the NeRSemble paper PDF and the FovVideoVDP paper's fitted
tables are not on this machine (PAPERS.md retrieval returned nothing usable)
and there is no network egress to fetch them. What the calibration therefore
rests on, explicitly: (1) the PSNR 31.48 <-> JOD 7.85 hard anchor, (2) the
JOD-10-at-identical hard anchor, (3) an asserted-and-documented local slope.
Within-run comparisons (is checkpoint A better than B) are slope-robust;
absolute cross-paper comparisons carry the slope caveat. When the real
pyfvvdp is importable it is auto-preferred and this whole file is moot
(utils/jod.py resolution order).

Distortion model: gaussian blur + light noise on a textured synthetic head
frame stack (blur/ghosting dominates NeRF novel-view error; pure noise is
also scored, as a monotonicity check only).

Usage:
    python scripts/calibrate_jod.py [--size 256 352] [--frames 6]
Prints the calibration table and the fitted constants. The fitted values are
baked into utils/fvvdp.py::FvvdpParameters and pinned by
tests/test_fvvdp.py::test_jod_calibration_anchor.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_frames(h: int, w: int, n_frames: int, seed: int = 0) -> np.ndarray:
    """[F, H, W, 3] float in [0,1]: textured blob with slow motion (a proxy
    for a head capture: smooth shading + high-frequency texture + motion)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy = (yy - h / 2) / (h / 2)
    xx = (xx - w / 2) / (w / 2)
    # band-limited texture (a few octaves) shared across frames
    tex = np.zeros((h, w), np.float32)
    for octave in range(4):
        f = 2.0 ** octave
        ph = rng.uniform(0, 2 * np.pi, 4)
        tex += (np.sin(6.28 * f * xx * 1.3 + ph[0]) * np.sin(6.28 * f * yy + ph[1])
                + 0.5 * np.sin(6.28 * f * (xx + yy) + ph[2])) / (2.0 ** octave)
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9)
    frames = []
    for fidx in range(n_frames):
        dx = 0.03 * np.sin(2 * np.pi * fidx / max(n_frames, 1))
        r2 = (xx - dx) ** 2 + yy ** 2
        blob = np.clip(1.2 - 1.4 * np.sqrt(r2), 0, 1)  # soft head-ish disk
        base = 0.15 + 0.7 * blob * (0.45 + 0.55 * tex)
        rgbs = np.stack([base, base * 0.92 + 0.03, base * 0.85 + 0.02], -1)
        frames.append(np.clip(rgbs, 0, 1))
    return np.asarray(frames, np.float32)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def blur_stack(frames: np.ndarray, sigma: float, noise: float,
               seed: int = 1) -> np.ndarray:
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    out = np.stack([gaussian_filter(f, (sigma, sigma, 0)) for f in frames])
    if noise > 0:
        out = out + rng.normal(0, noise, out.shape).astype(np.float32)
    return np.clip(out, 0, 1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, nargs=2, default=(256, 352))
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--anchor-psnr", type=float, default=31.48)
    ap.add_argument("--anchor-jod", type=float, default=7.85)
    ap.add_argument("--jod-per-db", type=float, default=0.2,
                    help="derived local slope of the paper's baseline table")
    args = ap.parse_args()

    from nersemble_tpu.utils.fvvdp import VendoredFovVideoVDP, FvvdpParameters

    h, w = args.size
    ref = make_frames(h, w, args.frames)

    # distortion series: blur sigma tuned to hit a spread of PSNRs around the
    # anchor; light additive noise keeps the artifact NeRF-like
    series = [(1.0, 0.004), (2.2, 0.008), (3.2, 0.012), (4.5, 0.018),
              (6.5, 0.025), (9.0, 0.04), (13.0, 0.06), (18.0, 0.09)]
    metric = VendoredFovVideoVDP(params=FvvdpParameters(jod_a=1.0, jod_exp=1.0))

    rows = []
    for sigma, noise in series:
        test = blur_stack(ref, sigma, noise)
        p = psnr(test, ref)
        # run the pipeline with identity regression to recover raw Q:
        # jod = 10 - 1 * Q^1  =>  Q = 10 - jod  (floor at 0 never hits here)
        jod_raw, _ = metric.predict(test, ref, dim_order="FHWC",
                                    frames_per_second=24.0)
        Q = 10.0 - float(jod_raw)
        target = np.clip(args.anchor_jod
                         + args.jod_per_db * (p - args.anchor_psnr), 0.5, 9.7)
        rows.append((sigma, noise, p, Q, float(target)))
        print(f"blur sigma={sigma:4.1f} noise={noise:.3f}  PSNR={p:6.2f}  "
              f"raw Q={Q:10.6f}  target JOD={target:.2f}")

    # fit log(10 - jod_target) = log a + b log Q, anchor row weighted 3x
    Qs = np.asarray([r[3] for r in rows])
    tgt = np.asarray([r[4] for r in rows])
    wgt = np.asarray([3.0 if abs(r[2] - args.anchor_psnr) < 1.5 else 1.0
                      for r in rows])
    X = np.stack([np.ones_like(Qs), np.log(np.maximum(Qs, 1e-12))], 1)
    y = np.log(10.0 - tgt)
    WX = X * wgt[:, None]
    coef, *_ = np.linalg.lstsq(WX, y * wgt, rcond=None)
    jod_a, jod_exp = float(np.exp(coef[0])), float(coef[1])
    print(f"\nfitted: jod_a={jod_a:.4f}  jod_exp={jod_exp:.4f}")

    print("\ncalibration table (fitted regression):")
    for sigma, noise, p, Q, target in rows:
        jod = 10.0 - jod_a * Q ** jod_exp
        print(f"  PSNR {p:6.2f} -> JOD {jod:5.2f}  (target {target:.2f})")

    # monotonicity check on a pure-noise series (not used in the fit)
    print("\nnoise-only monotonicity check:")
    prev = 10.0
    for noise in (0.005, 0.02, 0.05, 0.1):
        test = np.clip(ref + np.random.default_rng(2).normal(
            0, noise, ref.shape), 0, 1).astype(np.float32)
        jod_raw, _ = metric.predict(test, ref, dim_order="FHWC",
                                    frames_per_second=24.0)
        jod = 10.0 - jod_a * max(10.0 - float(jod_raw), 0.0) ** jod_exp
        flag = "OK" if jod < prev else "NOT MONOTONE"
        print(f"  noise {noise:.3f}: PSNR {psnr(test, ref):6.2f} "
              f"-> JOD {jod:5.2f}  {flag}")
        prev = jod


if __name__ == "__main__":
    main()
