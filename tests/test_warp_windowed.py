"""Windowed (mip-pyramid) warp: exactness at level 0, pooled-reference at
level 1, geometry/level selection — the op that lets alignment read
original-resolution pixels (reference ``face_aligner.py:102-128``) at
O(window²) cost instead of O(frame²)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.ops.umeyama import umeyama
from deepfake_vit_tpu.ops.warp import (
    _avg_pool2,
    invert_affine,
    max_window_levels,
    warp_affine,
    warp_affine_windowed,
    window_geometry,
)

REF5 = np.array(
    [[69.4, 71.7], [154.6, 71.7], [112.0, 123.2], [78.4, 168.0], [145.6, 168.0]],
    np.float32,
)


def _face_transforms(rng, B, frame, scale_lo, scale_hi):
    out = []
    for _ in range(B):
        scale = rng.uniform(scale_lo, scale_hi)
        theta = rng.uniform(-0.4, 0.4)
        cx, cy = rng.uniform(frame * 0.3, frame * 0.7, 2)
        R = scale * np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        out.append(REF5 @ R.T + [cx - 112 * scale, cy - 112 * scale])
    lms = jnp.asarray(np.stack(out))
    return umeyama(lms, jnp.broadcast_to(jnp.asarray(REF5), (B, 5, 2)))


def test_level0_matches_full_warp(rng):
    B, S = 8, 320
    img = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    tf = _face_transforms(rng, B, S, 0.3, 0.5)
    full = np.asarray(warp_affine(img, tf, (224, 224)))
    win = np.asarray(warp_affine_windowed(img, tf, (224, 224), window=160))
    level, _, _, _ = window_geometry(
        invert_affine(tf), (224, 224), (S, S), 160, 2
    )
    lv = np.asarray(level)
    err = np.abs(full - win).reshape(B, -1).max(1)
    assert (lv == 0).sum() >= B // 2, "fixture should produce mostly-small faces"
    assert err[lv == 0].max() < 1e-2


def test_level1_matches_pooled_warp(rng):
    B, S = 8, 320
    img = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    tf = _face_transforms(rng, B, S, 0.95, 1.3)  # big faces → level 1
    win = np.asarray(warp_affine_windowed(img, tf, (224, 224), window=160))
    level, y0s, x0s, A_win = window_geometry(
        invert_affine(tf), (224, 224), (S, S), 160, 2
    )
    assert np.asarray(level).min() == 1
    A1 = np.asarray(A_win).copy()
    A1[:, 0, 2] += np.asarray(x0s[1])
    A1[:, 1, 2] += np.asarray(y0s[1])
    ref = np.asarray(
        warp_affine(_avg_pool2(img), jnp.asarray(A1), (224, 224), inverse=True)
    )
    assert np.abs(ref - win).max() < 1e-3


def test_border_zero_outside_frame(rng):
    """A face near the frame edge: out-of-frame taps must be 0 (cv2
    BORDER_CONSTANT) even though the window is clipped inside the frame."""
    B, S = 2, 320
    img = jnp.asarray(rng.uniform(1, 255, (B, S, S, 3)), jnp.float32)
    out = []
    for cx, cy in [(10.0, 160.0), (310.0, 15.0)]:  # centers near edges
        scale = 0.35
        out.append(REF5 * scale + [cx - 112 * scale, cy - 112 * scale])
    lms = jnp.asarray(np.stack(out))
    tf = umeyama(lms, jnp.broadcast_to(jnp.asarray(REF5), (B, 5, 2)))
    full = np.asarray(warp_affine(img, tf, (224, 224)))
    win = np.asarray(warp_affine_windowed(img, tf, (224, 224), window=160))
    np.testing.assert_allclose(win, full, atol=1e-2)
    assert (full == 0).any(), "fixture should map some output outside the frame"


def test_max_window_levels():
    assert max_window_levels((640, 640), 160) == 3
    assert max_window_levels((320, 320), 160) == 2
    assert max_window_levels((160, 160), 160) == 1
    assert max_window_levels((320, 320), 128) == 2  # 320/4=80 < 128


def test_y0_alignment_and_bounds(rng):
    B, S, W = 16, 320, 160
    tf = _face_transforms(rng, B, S, 0.3, 1.4)
    level, y0s, x0s, _ = window_geometry(
        invert_affine(tf), (224, 224), (S, S), W, 2
    )
    for l in range(2):
        Sl = S >> l
        y0, x0 = np.asarray(y0s[l]), np.asarray(x0s[l])
        assert (y0 % 8 == 0).all()
        assert (y0 >= 0).all() and (y0 <= Sl - W).all()
        assert (x0 >= 0).all() and (x0 <= Sl - W).all()


def test_fractional_exact_when_fitting(rng):
    """Fractional windowed warp is exact (same as the full warp) whenever
    the quad fits the window at r == 1 — identity taps from integer-snapped
    starts."""
    B, S = 8, 320
    img = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    tf = _face_transforms(rng, B, S, 0.3, 0.45)
    full = np.asarray(warp_affine(img, tf, (224, 224)))
    frac = np.asarray(
        warp_affine_windowed(img, tf, (224, 224), window=160, fractional=True)
    )
    from deepfake_vit_tpu.ops.warp import frac_window_levels, window_geometry_frac

    level, _, r, _, _, _ = window_geometry_frac(
        invert_affine(tf), (224, 224), (S, S), 160,
        frac_window_levels(S, 160), y_align=16,
    )
    sel = np.asarray(r) == 1.0
    assert sel.sum() >= B // 2, "fixture should produce mostly r==1 faces"
    err = np.abs(full - frac).reshape(B, -1).max(1)
    assert err[sel].max() < 1e-2


def _smooth_images(rng, B, S, factor=4):
    """Natural-spectrum fixtures: bilinearly-upsampled low-res noise (pure
    noise aliases equally under every resampler and hides the difference
    between block-average and bilinear taps; 4× keeps edge-scale content
    like the rendered-face corpus the BASELINE table uses)."""
    small = jnp.asarray(
        rng.uniform(0, 255, (B, S // factor, S // factor, 3)), jnp.float32
    )
    return jax.image.resize(small, (B, S, S, 3), "bilinear")


def test_fractional_beats_block_average(rng):
    """For faces larger than the window, fractional resampling must be
    closer to the exact warp than the 2^l block average (the measured
    BASELINE.md round-3 table in miniature)."""
    B, S = 12, 320
    img = _smooth_images(rng, B, S)
    tf = _face_transforms(rng, B, S, 0.8, 1.3)  # big faces -> r > 1
    full = np.asarray(warp_affine(img, tf, (224, 224)))
    block = np.asarray(warp_affine_windowed(img, tf, (224, 224), window=160))
    frac = np.asarray(
        warp_affine_windowed(img, tf, (224, 224), window=160, fractional=True)
    )
    rmse_block = np.sqrt(((block - full) ** 2).mean())
    rmse_frac = np.sqrt(((frac - full) ** 2).mean())
    assert rmse_frac < rmse_block * 0.9, (rmse_frac, rmse_block)


def test_fractional_covers_giant_faces():
    """Quads larger than window·2^(levels_pooled−1) stay covered: the top
    fractional bucket is the whole frame, so no quad row is ever cropped
    (max error stays bounded by resample blur, not 255-scale truncation).

    Local rng: the session fixture's stream position depends on test
    ordering, and random quads centered near the frame edge legitimately
    sample outside it (the EXACT warp zeroes there too) — the coverage
    claim is "frac is nonzero wherever the exact warp is", not "the
    interior is never zero"."""
    rng = np.random.default_rng(42)
    B, S = 6, 320
    img = _smooth_images(rng, B, S, factor=16) + 20.0
    tf = _face_transforms(rng, B, S, 1.2, 1.4)
    full = np.asarray(warp_affine(img, tf, (224, 224)))
    frac = np.asarray(
        warp_affine_windowed(img, tf, (224, 224), window=64, fractional=True)
    )
    err = np.abs(frac - full)
    assert np.sqrt((err ** 2).mean()) < 25.0
    # No cropped quad rows: wherever the exact warp has real pixel mass in
    # the output interior, the fractional path must too.
    interior_full = full[:, 64:160, 64:160]
    interior_frac = frac[:, 64:160, 64:160]
    assert (interior_frac[interior_full > 10.0] > 0).all()


def test_fractional_wide_quad_on_landscape_frame():
    """Regression (review, 2026-08-18): r was capped by frame HEIGHT for
    both axes, so a quad wider than the frame height on a landscape frame
    lost real in-frame columns. The horizontal axis never had a strip to
    fit — the window may overhang vertically (out-of-frame rows are
    border 0, exactly like the exact warp)."""
    rng = np.random.default_rng(3)
    H, W, window = 128, 256, 32
    img = _smooth_images(rng, 2, W, factor=16)[:, :H] + 20.0
    # In-frame quad ~200 px wide (> H): dst→src scale 200/223 horizontal.
    A_inv = np.asarray(
        [[[200 / 223.0, 0.0, 28.0], [0.0, 80 / 223.0, 24.0]]] * 2,
        np.float32,
    )
    full = np.asarray(warp_affine(img, jnp.asarray(A_inv), (224, 224),
                                  inverse=True))
    frac = np.asarray(
        warp_affine_windowed(img, jnp.asarray(A_inv), (224, 224),
                             window=window, fractional=True, inverse=True)
    )
    err = frac - full
    assert np.sqrt((err ** 2).mean()) < 25.0
    # The right half of the quad (x > 128 = frame height) must be covered.
    right = full[:, :, 140:200]
    assert (frac[:, :, 140:200][right > 10.0] > 0).all()


def test_fractional_bottom_rows_on_hs_mod8_frame():
    """Regression (review, 2026-08-18): the 16-aligned strip start could
    not reach the bottom Hs%16 rows on Hs ≡ 8 (mod 16) frames — a
    bottom-edge face lost real rows. The wrapper now zero-pads the frame
    to the 16-row tile (point taps sample pads as border 0 exactly)."""
    rng = np.random.default_rng(4)
    H, W, window = 136, 128, 32
    img = _smooth_images(rng, 2, max(H, W), factor=16)[:, :H, :W] + 20.0
    # Face hugging the bottom edge: quad rows ~[100, 134].
    A_inv = np.asarray(
        [[[34 / 223.0, 0.0, 40.0], [0.0, 34 / 223.0, 100.0]]] * 2,
        np.float32,
    )
    full = np.asarray(warp_affine(img, jnp.asarray(A_inv), (224, 224),
                                  inverse=True))
    frac = np.asarray(
        warp_affine_windowed(img, jnp.asarray(A_inv), (224, 224),
                             window=window, fractional=True, inverse=True)
    )
    err = frac - full
    assert np.sqrt((err ** 2).mean()) < 25.0
    # Bottom-of-quad output rows (near the frame's last rows) stay real.
    bottom = full[:, 200:, :]
    assert (frac[:, 200:, :][bottom > 10.0] > 0).all()


def test_fractional_levels_param_rejected():
    import pytest as _pytest

    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    M = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32)
    with _pytest.raises(ValueError, match="levels"):
        warp_affine_windowed(img, M, (24, 24), window=32, levels=2,
                             fractional=True)
