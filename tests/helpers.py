"""Shared test assertions."""
import numpy as np


def assert_images_close(a, b, atol=1e-5, boundary_frac=0.01, mean_atol=0.005):
    """Images equal up to ulp noise except on visibility boundaries.

    A path tracer's pixel value is a discontinuous function of ulp-level
    arithmetic: two compilations of the same math (jit vs eager, fused vs
    not) may flip discrete outcomes (hit/miss, mirror/diffuse, sun-disk
    membership) on silhouette pixels. So: all but ``boundary_frac`` of
    pixels must match to ``atol``, the image-wide MEAN abs difference
    must stay under ``mean_atol`` (bounding how much the boundary pixels
    can collectively differ), and no pixel may be non-finite.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape
    assert np.isfinite(a).all() and np.isfinite(b).all()
    diff = np.abs(a - b)
    per_pixel = diff.reshape(-1, a.shape[-1]).max(axis=-1)
    frac = (per_pixel > atol).mean()
    assert frac <= boundary_frac, (
        f"{frac:.2%} of pixels differ by more than {atol} "
        f"(max {per_pixel.max():.3g}); allowed {boundary_frac:.2%}"
    )
    assert diff.mean() <= mean_atol, (
        f"mean abs diff {diff.mean():.4g} exceeds {mean_atol}"
    )
