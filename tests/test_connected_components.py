"""Occupancy-grid connected-component postfilter (eval-time floater removal).

Reference: src/nersemble/util/connected_components.py:29-139 and its use at
scripts/evaluate/evaluate_nersemble.py:68-73 (threshold 0.05). The filter runs
once per evaluation on the host; these tests pin its behavior on synthetic
grids: the largest component survives (erosion-enlarged), floaters die, and an
under-trained grid (all occupancies below the rescale threshold) yields an
empty mask plus a loud warning instead of silent black frames.
"""

import numpy as np

from nersemble_tpu.utils.connected_components import (
    extract_top_k_connected_component,
    filter_occupancy_grid_mask,
)

G = 64


def _logit(p):
    return np.log(p / (1.0 - p))


def make_grid(blobs):
    """blobs: list of (center, half_size, occ_value) cubes on a [G]^3 grid
    of raw (pre-sigmoid) densities ~0 elsewhere."""
    # background raw density 0.0 rescales exactly to uint8 0 — negative
    # values like -4.0 hit platform-dependent negative-float-to-uint8
    # conversion (wraps on x86, saturates on ARM)
    grid = np.zeros((G, G, G), np.float32)  # sigmoid = 0.5 -> rescaled 0
    for (cx, cy, cz), h, val in blobs:
        grid[cx - h:cx + h, cy - h:cy + h, cz - h:cz + h] = val
    return grid


def test_largest_component_survives_floater_dies():
    # big center blob + small far-corner floater, both well above threshold
    hot = _logit(0.9)
    grid = make_grid([((32, 32, 32), 8, hot), ((8, 8, 8), 2, hot)])
    mask = filter_occupancy_grid_mask(grid.reshape(-1), G, threshold=0.05)
    # the floater is gone...
    assert not mask[6:10, 6:10, 6:10].any()
    # ...the main blob's core is kept (erosion-enlarged, so a superset of
    # the blurred-thresholded component's interior)
    assert mask[28:36, 28:36, 28:36].all()
    # and the mask is a single local region, not the whole grid
    assert mask.sum() < mask.size * 0.5


def test_erosion_enlarges_largest_component():
    hot = _logit(0.9)
    grid = make_grid([((32, 32, 32), 6, hot)])
    comp = extract_top_k_connected_component(grid, threshold=0.05,
                                             sigma_erosion=2.0, k=1)[-1]
    # gaussian "erosion-enlarge" grows the blob beyond its thresholded core
    core = grid > 0
    assert comp[core].all()
    assert comp.sum() > core.sum()


def test_top_k_returns_smaller_components_unenlarged():
    hot = _logit(0.9)
    grid = make_grid([((32, 32, 32), 8, hot), ((10, 10, 10), 3, hot)])
    comps = extract_top_k_connected_component(grid, threshold=0.05, k=2)
    # largest last; the smaller component is returned raw (no enlargement)
    assert comps[-1].sum() > comps[0].sum()
    assert comps[0][8:13, 8:13, 8:13].any()
    assert not comps[0][28:36, 28:36, 28:36].any()


def test_under_trained_grid_warns_and_returns_empty(capsys):
    # EMA occupancies of an early checkpoint: max ~0.07 raw -> rescaled
    # (sigmoid-0.5)*2 ~ 0.037 < 0.05 threshold -> empty mask (matches the
    # reference pipeline) + a stderr warning naming the failure mode
    grid = np.random.default_rng(0).uniform(0.0, 0.074, G ** 3).astype(np.float32)
    mask = filter_occupancy_grid_mask(grid, G, threshold=0.05)
    assert not mask.any()
    err = capsys.readouterr().err
    assert "kept 0 cells" in err and "threshold" in err


def test_all_background_grid_no_components():
    # 0.0 raw (not a negative value) — see make_grid's uint8-conversion note
    grid = np.zeros((G, G, G), np.float32)
    comps = extract_top_k_connected_component(grid, threshold=0.05, k=2)
    assert len(comps) == 2 and not any(c.any() for c in comps)
