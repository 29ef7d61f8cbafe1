"""Pallas warp kernel correctness (interpret mode on the CPU mesh; the
real-chip speed check lives in bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepfake_vit_tpu.ops.pallas.warp_kernel import warp_affine_pallas
from deepfake_vit_tpu.ops.warp import warp_affine


@pytest.mark.parametrize("theta,scale", [(0.0, 0.7), (0.15, 1.1), (-0.3, 0.9)])
def test_pallas_warp_matches_gather(rng, theta, scale):
    img = rng.uniform(0, 255, (2, 64, 80, 3)).astype(np.float32)
    R = scale * np.asarray(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    M = np.concatenate([R, np.asarray([[4.0], [2.0]])], axis=1).astype(np.float32)
    Ms = np.tile(M, (2, 1, 1))

    with pltpu.force_tpu_interpret_mode():
        out = warp_affine_pallas(jnp.asarray(img), jnp.asarray(Ms), (32, 32))
    ref = warp_affine(jnp.asarray(img), jnp.asarray(Ms), (32, 32))
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # bf16 pixels + taps + P intermediate: ≤ ~2.5 units on the 0-255 scale
    # (≈1% relative), mean well under half a unit.
    assert err.max() < 2.5
    assert err.mean() < 0.4


def test_pallas_warp_border_zero(rng):
    """Transform pushing half the output outside the source → zeros there."""
    img = np.full((1, 40, 40, 3), 200.0, np.float32)
    # dst→src: shift far right so left half of output samples outside.
    M = np.asarray([[[1.0, 0.0, -30.0], [0.0, 1.0, 0.0]]], np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(warp_affine_pallas(jnp.asarray(img), jnp.asarray(M), (40, 40)))
    ref = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(M), (40, 40)))
    np.testing.assert_allclose(out, ref, atol=1.5)
    assert out[0, :, -5:, :].max() == 0.0  # fully-outside region is border 0


@pytest.mark.parametrize("construction", ["legacy", "mxu"])
def test_crop_window_pool_pallas_matches_xla(rng, construction):
    """Pool-fused crop kernel (one cell per image, in-kernel 4^l-block
    averaging, selection-matmul column offset) vs XLA pyramid + crop."""
    from deepfake_vit_tpu.ops.pallas.warp_kernel import crop_window_pool_pallas
    from deepfake_vit_tpu.ops.warp import _avg_pool2, _crop_window_xla

    B, H, W, C, window = 6, 128, 192, 3, 32
    img = jnp.asarray(rng.uniform(0, 255, (B, H, W, C)), jnp.float32)
    levels = 3  # 32 << 2 = 128 rows max support fits H
    level = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
    # Selected-level offsets (y0 16-aligned per the bf16 tile contract).
    y0 = jnp.asarray([0, 16, 0, 96, 32, 0], jnp.int32)
    x0 = jnp.asarray([0, 17, 8, 160, 5, 16], jnp.int32)

    y0_l0 = jnp.left_shift(y0, level)
    out = None
    for dtype in (jnp.float32, jnp.bfloat16):
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(
                crop_window_pool_pallas(
                    img.astype(dtype).reshape(B, H, W * C),
                    y0_l0, x0, level, window, C, levels,
                    construction=construction,
                ).astype(jnp.float32)
            ).reshape(B, window, window, C)

        pyr = img
        refs = []
        for l in range(levels):
            refs.append(pyr)
            pyr = _avg_pool2(pyr)
        for b in range(B):
            lv = int(level[b])
            ref = _crop_window_xla(
                refs[lv][b:b + 1], y0[b:b + 1], x0[b:b + 1], window
            )[0]
            atol = 1e-4 if dtype == jnp.float32 else 1.5
            np.testing.assert_allclose(out[b], np.asarray(ref), atol=atol)


def test_auto_row_chunk_vmem_budget():
    """Chunk auto-selection: 32 for window-sized crops, smaller for
    full-frame sources (the 320² preprocess path OOM'd the 16 MB scoped
    VMEM at R=32 — round-3 regression)."""
    from deepfake_vit_tpu.ops.pallas.warp_kernel import _auto_row_chunk

    assert _auto_row_chunk(160, 160, 224, 3) == 32
    assert _auto_row_chunk(128, 128, 224, 3) == 32
    assert _auto_row_chunk(320, 320, 224, 3) <= 16
    assert _auto_row_chunk(640, 640, 224, 3) <= 8


@pytest.mark.parametrize("construction", ["legacy", "mxu"])
def test_crop_window_frac_pallas_matches_xla(rng, construction):
    """Fractional-scale crop kernel vs the XLA fractional reference path:
    same geometry (y_align 16, 2^-16-quantized r), so the only deltas are
    bf16 taps/pixels."""
    from deepfake_vit_tpu.ops.pallas.warp_kernel import crop_window_frac_pallas
    from deepfake_vit_tpu.ops.warp import (
        _frac_crop_xla,
        frac_window_levels,
        window_geometry_frac,
    )
    from deepfake_vit_tpu.ops.umeyama import invert_affine

    B, H, W, C, window = 6, 128, 192, 3, 32
    img = jnp.asarray(rng.uniform(0, 255, (B, H, W, C)), jnp.float32)
    levels = frac_window_levels(H, window)  # 32 -> 64 -> 128 rows
    # Scales spanning buckets 0..2 (out 24², so quad span = 23·s).
    scales = np.asarray([0.5, 1.0, 1.6, 2.4, 3.5, 4.5], np.float32)
    thetas = np.asarray([0.0, 0.2, -0.3, 0.1, -0.1, 0.25], np.float32)
    Ms = []
    for s, t in zip(scales, thetas):
        R = s * np.asarray(
            [[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]], np.float32
        )
        Ms.append(np.concatenate([R, [[40.0], [50.0]]], axis=1))
    A_inv = jnp.asarray(np.stack(Ms))  # dst→src directly

    out_size = (24, 24)
    level, strip0s, r, off_y, x0f, _ = window_geometry_frac(
        A_inv, out_size, (H, W), window, levels, y_align=16
    )
    assert len(set(np.asarray(level).tolist())) >= 2, "buckets should vary"
    strip0 = strip0s[level, jnp.arange(B)]

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            crop_window_frac_pallas(
                img.astype(jnp.bfloat16).reshape(B, H, W * C),
                strip0, level, r, off_y, x0f, window, C, levels,
                construction=construction,
            ).astype(jnp.float32)
        ).reshape(B, window, window, C)

    ref = np.asarray(
        _frac_crop_xla(
            img, strip0.astype(jnp.float32) + off_y, x0f, r, window
        )
    )
    err = np.abs(out - ref)
    assert err.max() < 2.5, f"max {err.max():.2f}"
    assert err.mean() < 0.4


def test_windowed_frac_full_path_interpret(rng):
    """warp_affine_windowed(fractional=True) pallas path (interpret) vs the
    XLA fractional path — end-to-end, both resolutions of the serving
    configs in miniature."""
    from deepfake_vit_tpu.ops.warp import warp_affine_windowed

    B, S, window = 4, 128, 32
    img = rng.uniform(0, 255, (B, S, S, 3)).astype(np.float32)
    Ms = []
    for s, t in [(0.35, 0.1), (0.8, -0.2), (1.4, 0.0), (2.2, 0.3)]:
        R = s * np.asarray(
            [[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]], np.float32
        )
        Ms.append(np.concatenate([R, [[30.0], [40.0]]], axis=1))
    tf = np.linalg.inv(
        np.concatenate(
            [np.stack(Ms), np.tile([[0.0, 0.0, 1.0]], (B, 1, 1))], axis=1
        )
    )[:, :2]  # src→dst so the function inverts back
    args = (jnp.asarray(img), jnp.asarray(tf), (24, 24))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            warp_affine_windowed(*args, window=window, fractional=True,
                                 use_pallas=True)
        )
    ref = np.asarray(
        warp_affine_windowed(*args, window=window, fractional=True,
                             use_pallas=False)
    )
    assert np.abs(out - ref).max() < 3.0


@pytest.mark.parametrize("construction", ["uw", "uw16"])
def test_pallas_warp_uw_constructions_match_legacy(rng, construction):
    """Rank-2 MXU tap construction (U = 1−d, W = 1+d, tri = max(0, min)):
    "uw" is the legacy 1−|d| value up to FMA association; "uw16" adds one
    bf16 rounding at the |d|≈0 boundary — both within the kernel's bf16
    error class. The 60×72 source exercises the pad-to-16 path the U/W
    sublane split requires."""
    img = rng.uniform(0, 255, (2, 60, 72, 3)).astype(np.float32)
    theta, scale = 0.2, 0.9
    R = scale * np.asarray(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    M = np.concatenate([R, np.asarray([[4.0], [2.0]])], axis=1).astype(np.float32)
    Ms = jnp.asarray(np.tile(M, (2, 1, 1)))

    with pltpu.force_tpu_interpret_mode():
        legacy = np.asarray(
            warp_affine_pallas(jnp.asarray(img), Ms, (32, 32))
        )
        out = np.asarray(
            warp_affine_pallas(jnp.asarray(img), Ms, (32, 32),
                               construction=construction)
        )
    atol = 0.6 if construction == "uw" else 2.0
    np.testing.assert_allclose(out, legacy, atol=atol)
    # And both stay within the kernel's documented error vs the exact warp.
    ref = np.asarray(warp_affine(jnp.asarray(img), Ms, (32, 32)))
    err = np.abs(out - ref)
    assert err.max() < 3.0
    assert err.mean() < 0.5


def test_windowed_warp_tap_construction_plumbs(rng):
    """warp_affine_windowed(tap_construction=...) reaches the warp kernel
    on both the block and fractional pallas paths."""
    from deepfake_vit_tpu.ops.warp import warp_affine_windowed

    B, S, window = 2, 128, 32
    img = rng.uniform(0, 255, (B, S, S, 3)).astype(np.float32)
    tf = np.tile(
        np.asarray([[0.6, 0.0, 30.0], [0.0, 0.6, 40.0]], np.float32),
        (B, 1, 1),
    )
    args = (jnp.asarray(img), jnp.asarray(tf), (24, 24))
    for frac in (False, True):
        with pltpu.force_tpu_interpret_mode():
            legacy = np.asarray(
                warp_affine_windowed(*args, window=window, fractional=frac,
                                     use_pallas=True)
            )
            uw = np.asarray(
                warp_affine_windowed(*args, window=window, fractional=frac,
                                     use_pallas=True, tap_construction="uw16")
            )
        np.testing.assert_allclose(uw, legacy, atol=2.0)


def test_pallas_warp_int8_construction(rng):
    """int8 mode: q7 V taps + shifted-s8 pixels + separable 128·ΣV·ΣH
    correction. Error class ~2⁻⁷ taps ≈ ≤ ~3 units on 0-255; border-0
    semantics must hold exactly (pad/outside taps zeroed via the LHS
    `valid` rows — shifted pads decode to 128, not 0)."""
    img = rng.uniform(0, 255, (2, 60, 72, 3)).astype(np.float32)
    theta, scale = -0.25, 1.1
    R = scale * np.asarray(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    M = np.concatenate([R, np.asarray([[4.0], [2.0]])], axis=1).astype(np.float32)
    Ms = jnp.asarray(np.tile(M, (2, 1, 1)))

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            warp_affine_pallas(jnp.asarray(img), Ms, (32, 32),
                               construction="int8")
        )
    # int8 rounds pixels to the integer grid first — compare against the
    # exact warp of the rounded image.
    ref = np.asarray(warp_affine(jnp.asarray(np.round(img)), Ms, (32, 32)))
    err = np.abs(out - ref)
    assert err.max() < 3.5, f"max {err.max():.2f}"
    assert err.mean() < 0.6

    # Border: shift pushing half the output outside → exact zeros there.
    img2 = np.full((1, 48, 48, 3), 200.0, np.float32)
    M2 = jnp.asarray(
        np.asarray([[[1.0, 0.0, -30.0], [0.0, 1.0, 0.0]]], np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        out2 = np.asarray(
            warp_affine_pallas(jnp.asarray(img2), M2, (48, 48),
                               construction="int8")
        )
    assert out2[0, :, -5:, :].max() == 0.0


def test_rank1_tri_identity():
    """The rank-1 construction's algebra (round 4): with U = sigma*(1-d)+beta
    from the _tri_uw_lhs matmul, tri taps are max(beta, c-|U-c|), c=sigma+beta
    — exactly sigma*max(0, 1-|d|)+beta on valid rows, and exactly the tap-zero
    sentinel on invalid rows. This identity is what lets the kernels drop the
    W matmul block (W = 2c-U), halving their largest scoped-VMEM stack
    tensor (the round-4 OOM fix)."""
    from deepfake_vit_tpu.ops.pallas.warp_kernel import _tri_from_u, _tri_uw_lhs

    rng = np.random.default_rng(7)
    size, n = 48, 64
    s = rng.uniform(-3.0, size + 3.0, (1, n)).astype(np.float32)
    rhs = np.concatenate([s, np.ones((1, n), np.float32),
                          np.zeros((6, n), np.float32)], axis=0)

    # f32 mode (sigma=1, beta=0), with the last 8 rows marked invalid.
    lhs = _tri_uw_lhs(size, jnp.float32, valid=size - 8)
    assert lhs.shape == (size, 8)
    U = np.asarray(lhs) @ rhs
    got = np.asarray(_tri_from_u(jnp.asarray(U), 1.0))
    d = s - np.arange(size, dtype=np.float32)[:, None]
    want = np.maximum(0.0, 1.0 - np.abs(d))
    want[size - 8:] = 0.0
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # int8 mode (sigma=127, beta=0.5): trunc-to-int8 must equal
    # round(127*tri), including 0 on invalid rows and out-of-support.
    lhs8 = _tri_uw_lhs(size, jnp.float32, scale=127.0, bias=0.5,
                       valid=size - 8)
    U8 = np.asarray(lhs8) @ rhs
    q = np.asarray(_tri_from_u(jnp.asarray(U8), 127.5, 0.5)).astype(np.int8)
    want_q = np.round(127.0 * want).astype(np.int8)
    np.testing.assert_array_equal(q, want_q)
