"""Pallas histogram-percentile kernel vs the exact sort-based path."""

import numpy as np
import pytest

from thermal3d.kernels.image_ops import percentile_enhance_pallas
from thermal3d.preprocess.enhance import percentile_rescale


def test_matches_sort_path_on_uint16_data(rng):
    raw = rng.integers(21000, 26000, (3, 32, 64)).astype(np.float32) / 65535.0
    ours = np.asarray(percentile_enhance_pallas(raw, interpret=True))
    ref = np.asarray(percentile_rescale(raw))
    # exact on the 16-bit grid up to one quantization step of interpolation
    assert np.abs(ours - ref).max() < 2e-3
    assert ours.min() >= 0 and ours.max() <= 1


def test_handles_extreme_distribution(rng):
    raw = np.full((1, 16, 32), 0.5, np.float32)
    raw[0, :4] = 0.9  # 12.5% hot region
    out = np.asarray(percentile_enhance_pallas(raw, interpret=True))
    assert np.isfinite(out).all()
    # hot region maps to 1 after 2/98 rescale
    assert out[0, :4].mean() > 0.9


def test_percentile_cut_positions(rng):
    """Pixels below p2 clamp to 0, above p98 clamp to 1 (preprocessing.py:23)."""
    raw = rng.uniform(0.2, 0.8, (1, 64, 64)).astype(np.float32)
    out = np.asarray(percentile_enhance_pallas(raw, interpret=True))
    frac_zero = float((out == 0).mean())
    frac_one = float((out == 1).mean())
    assert 0.005 < frac_zero < 0.05
    assert 0.005 < frac_one < 0.05
