"""Batched affine warp with bilinear sampling and constant border.

Replaces the reference's per-face ``cv2.warpAffine`` calls
(``face_aligner.py:119-126``) with one gather-based XLA kernel over the
whole batch: output pixel grids are mapped through the inverted affine,
sampled bilinearly with per-corner validity masks so out-of-bounds taps
contribute the border value — matching cv2's INTER_LINEAR +
BORDER_CONSTANT semantics (crop parity is what keeps AUC comparable,
SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .umeyama import invert_affine


def _bilinear_sample_one(
    img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray, border_value: float
) -> jnp.ndarray:
    """img: (H, W, C); xs, ys: (Ho, Wo) source coords. Returns (Ho, Wo, C)."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = xs - x0
    wx0 = 1.0 - wx1
    wy1 = ys - y0
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[yc, xc]  # (Ho, Wo, C) advanced-index gather
        vals = jnp.where(valid[..., None], vals, border_value)
        return w[..., None] * vals

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def warp_affine(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    border_value: float = 0.0,
    inverse: bool = False,
) -> jnp.ndarray:
    """Batched cv2.warpAffine equivalent.

    Args:
        images: (B, H, W, C) float.
        matrices: (B, 2, 3) affine src→dst (cv2 convention); the op inverts
            them internally unless ``inverse=True`` (matrices already dst→src).
        out_size: (Ho, Wo) output size.
    Returns:
        (B, Ho, Wo, C) warped images.
    """
    Ho, Wo = out_size
    images = images.astype(jnp.float32)
    A_inv = matrices if inverse else invert_affine(matrices)

    ys, xs = jnp.meshgrid(
        jnp.arange(Ho, dtype=jnp.float32), jnp.arange(Wo, dtype=jnp.float32), indexing="ij"
    )

    def one(img, A):
        sx = A[0, 0] * xs + A[0, 1] * ys + A[0, 2]
        sy = A[1, 0] * xs + A[1, 1] * ys + A[1, 2]
        return _bilinear_sample_one(img, sx, sy, border_value)

    return jax.vmap(one)(images, A_inv)


@partial(jax.jit, static_argnames=("out_size", "border_value"))
def warp_affine_jit(images, matrices, out_size, border_value=0.0):
    return warp_affine(images, matrices, out_size, border_value=border_value)


# ---------------------------------------------------------------------------
# Gather-free warp: one-hot matmuls on the MXU
# ---------------------------------------------------------------------------
#
# XLA gathers with 2-D computed indices are catastrophically slow on TPU
# (~170 ms for a 64×320² → 224² batch, measured on v5e), so the production
# warp reformulates bilinear sampling as dense linear algebra:
#
#   out[i,j,c] = Σ_t Σ_s V[(i,j),t] · H[(i,j),s] · img[t,s,c]
#
# where V/H hold the 2-tap vertical/horizontal bilinear weights (each row
# has ≤2 nonzeros, built from broadcasted iota — no indices ever leave the
# ALU). The t-contraction is an MXU matmul over a T_WIN-row source window
# (dynamically sliced per output-row chunk), the s-contraction a VPU
# weighted reduce. Zero-weight taps outside the image reproduce
# BORDER_CONSTANT=0 semantics exactly.
#
# Supported geometry: the source rows touched by one output-row chunk must
# fit the window: |A⁻¹[1,0]|·out_w + |A⁻¹[1,1]|·chunk + 2 ≤ window — e.g.
# ≥±25° of roll at window 128 for a 320→224 face warp, far beyond face
# alignment needs. For larger rotations fall back to `warp_affine`.


def warp_affine_matmul(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    inverse: bool = False,
    row_chunk: int = 16,
    window: int = 128,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Batched affine warp with bilinear sampling, MXU formulation.

    Same contract as :func:`warp_affine` with border_value=0. ``window``
    bounds the source-row span per ``row_chunk`` output rows (see module
    comment). bf16 tap weights give ≤~1/255 relative error on uint8-range
    images; pass ``compute_dtype=jnp.float32`` for exactness.
    """
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_size
    if Ho % row_chunk != 0:
        row_chunk = math_gcd_chunk(Ho, row_chunk)
    n_chunks = Ho // row_chunk
    window = min(window, Hs)

    A_inv = matrices if inverse else invert_affine(matrices)
    images = images.astype(compute_dtype)

    a, b_, c_ = A_inv[:, 0, 0], A_inv[:, 0, 1], A_inv[:, 0, 2]
    d, e, f = A_inv[:, 1, 0], A_inv[:, 1, 1], A_inv[:, 1, 2]

    js = jnp.arange(Wo, dtype=jnp.float32)
    s_iota = jnp.arange(Ws, dtype=jnp.float32)
    t_iota = jnp.arange(window, dtype=jnp.float32)
    i_chunk = jnp.arange(row_chunk, dtype=jnp.float32)

    def one_chunk(chunk_idx, img, av, bv, cv, dv, ev, fv):
        i0 = chunk_idx * row_chunk
        iis = i0 + i_chunk  # (R,)
        # Source coords for this chunk: (R, Wo)
        sx = av * js[None, :] + bv * iis[:, None] + cv
        sy = dv * js[None, :] + ev * iis[:, None] + fv

        # Window start: clamp so the slice stays in-bounds.
        t_start = jnp.clip(
            jnp.floor(jnp.min(sy)) - 1.0, 0.0, float(max(Hs - window, 0))
        ).astype(jnp.int32)
        win = jax.lax.dynamic_slice(img, (t_start, 0, 0), (window, Ws, C))

        # Vertical taps: V[(R·Wo), window]
        rel = sy.reshape(-1)[:, None] - (t_start.astype(jnp.float32) + t_iota)[None, :]
        V = jnp.maximum(0.0, 1.0 - jnp.abs(rel))
        # No explicit border mask needed: taps outside the image get zero
        # tri-weight (only in-bounds rows/cols appear in the iota), which is
        # exactly BORDER_CONSTANT=0 blending.
        # Horizontal taps: H[(R·Wo), Ws]
        relx = sx.reshape(-1)[:, None] - s_iota[None, :]
        H = jnp.maximum(0.0, 1.0 - jnp.abs(relx))

        # MXU: P[(R·Wo), Ws·C] = V @ win
        P = jnp.dot(
            V.astype(compute_dtype),
            win.reshape(window, Ws * C),
            preferred_element_type=jnp.float32,
        )
        P = P.reshape(-1, Ws, C)
        out = jnp.sum(P * H.astype(P.dtype)[:, :, None], axis=1)  # (R·Wo, C)
        return out.reshape(row_chunk, Wo, C)

    def per_image(img, av, bv, cv, dv, ev, fv):
        def body(carry, chunk_idx):
            return carry, one_chunk(chunk_idx, img, av, bv, cv, dv, ev, fv)

        _, chunks = jax.lax.scan(body, None, jnp.arange(n_chunks))
        return chunks.reshape(Ho, Wo, C)

    out = jax.vmap(per_image)(images, a, b_, c_, d, e, f)
    return out.astype(jnp.float32)


def math_gcd_chunk(total: int, preferred: int) -> int:
    """Largest divisor of ``total`` that is ≤ preferred."""
    for c in range(min(preferred, total), 0, -1):
        if total % c == 0:
            return c
    return 1


# ---------------------------------------------------------------------------
# Windowed warp: crop a face-sized window from a mip pyramid, then warp
# ---------------------------------------------------------------------------
#
# The dense one-hot-matmul warp's cost scales with SOURCE area (the MXU
# contraction is K = source height; the VPU tap build is O(source·output)).
# But the output quad of a face alignment covers only a small part of the
# frame: cropping a static ``window``² region around the quad first shrinks
# K from the frame size to the window regardless of frame resolution —
# which is also what makes warping from the ORIGINAL-resolution frame
# affordable (the reference aligns from the original image,
# ``face_aligner.py:102-128``; round 1 warped from the downscaled detection
# canvas, a fidelity divergence).
#
# Faces larger than the window use a coarser mip level (2× average-pooled),
# picked per image so the output resamples its source at a rate in
# [~0.5, 1] — standard mipmapping; small faces (the common case) read the
# original pixels exactly, bit-identical to the full-frame warp.


def _avg_pool2(images: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = images.shape
    return images.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def max_window_levels(src_hw: Tuple[int, int], window: int) -> int:
    """Number of usable mip levels: every level must still contain a full
    window and keep the row-offset range 8-aligned."""
    H, W = src_hw
    levels = 1
    while (
        H % (2 ** levels) == 0
        and W % (2 ** levels) == 0
        and (H >> levels) >= window
        and (W >> levels) >= window
    ):
        levels += 1
    return levels


def _quad_extent(A_inv: jnp.ndarray, out_size: Tuple[int, int]):
    """Level-0 output-quad extent and center for window geometries.

    Returns (a, b, c, d, e, f, span_x, span_y, cx, cy) — the affine
    coefficients and the axis-aligned quad bounding-box span/center in
    source pixels. Shared by window_geometry / window_geometry_frac so
    the extent convention can never diverge between the two paths."""
    Ho, Wo = out_size
    a, b = A_inv[:, 0, 0], A_inv[:, 0, 1]
    c = A_inv[:, 0, 2]
    d, e = A_inv[:, 1, 0], A_inv[:, 1, 1]
    f = A_inv[:, 1, 2]
    jm, im = float(Wo - 1), float(Ho - 1)
    span_x = jnp.abs(a) * jm + jnp.abs(b) * im
    span_y = jnp.abs(d) * jm + jnp.abs(e) * im
    cx = (a * jm + b * im) * 0.5 + c
    cy = (d * jm + e * im) * 0.5 + f
    return a, b, c, d, e, f, span_x, span_y, cx, cy


def window_geometry(
    A_inv: jnp.ndarray,
    out_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    window: int,
    levels: int,
    y_align: int = 8,
):
    """Per-image mip level, crop offsets, and window-space affine.

    A_inv: (B, 2, 3) dst→src affines in ORIGINAL source coords.
    Returns (level (B,) int32, y0s (levels, B), x0s (levels, B),
    A_win (B, 2, 3) dst→window affines for the selected level).

    Level ℓ is the smallest whose 2⁻ℓ-scaled output quad (+1px bilinear
    margin each side) fits the window, honoring the ``y_align``-row
    alignment slack (8 for f32 crops, 16 for bf16 whose VMEM sublane tile
    is 16);
    the quad may exceed the FRAME freely — out-of-frame taps fall outside
    the clipped window and get zero tri-weight, i.e. BORDER_CONSTANT=0.
    """
    Hs, Ws = src_hw
    a, b, c, d, e, f, span_x, span_y, cx, cy = _quad_extent(A_inv, out_size)

    # fits[ℓ] is monotone in ℓ, so level = #{ℓ < L−1 : not fits[ℓ]}.
    # Vertical slack is 2·y_align: the floor-aligned strip start can sit up
    # to y_align−1 rows ABOVE the centered position, eating the bottom
    # margin — w − y_align slack cropped up to y_align−1 quad rows for
    # borderline faces (found via the fractional path's coverage tests).
    level = jnp.zeros(a.shape, jnp.int32)
    for l in range(levels - 1):
        fit = ((span_x / 2**l + 2.0) <= window - 1) & (
            (span_y / 2**l + 2.0) <= window - 2 * y_align
        )
        level = level + (~fit).astype(jnp.int32)

    y0s, x0s = [], []
    for l in range(levels):
        scale = 2.0 ** -l
        off = 0.5 * (1.0 - scale)  # pixel-center shift of 2× avg-pooling
        cx_l = cx * scale - off
        cy_l = cy * scale - off
        Wl, Hl = Ws >> l, Hs >> l
        x0 = jnp.clip(
            jnp.round(cx_l - window / 2).astype(jnp.int32), 0, Wl - window
        )
        y0_raw = (
            jnp.floor((cy_l - window / 2) / y_align).astype(jnp.int32) * y_align
        )
        y0 = jnp.clip(y0_raw, 0, (Hl - window) // y_align * y_align)
        x0s.append(x0)
        y0s.append(y0)

    x0_sel = jnp.stack(x0s)[level, jnp.arange(level.shape[0])]
    y0_sel = jnp.stack(y0s)[level, jnp.arange(level.shape[0])]
    scale = 2.0 ** -level.astype(jnp.float32)
    off = 0.5 * (1.0 - scale)
    A_win = jnp.stack(
        [
            jnp.stack([a * scale, b * scale, c * scale - off - x0_sel], -1),
            jnp.stack([d * scale, e * scale, f * scale - off - y0_sel], -1),
        ],
        axis=1,
    )
    return level, jnp.stack(y0s), jnp.stack(x0s), A_win


def frac_window_levels(src_h: int, window: int) -> int:
    """Strip-size buckets for the fractional windowed warp: rows at bucket
    ℓ are ``min(window·2ˡ, src_h)`` — the top bucket is the whole frame
    height, so ``r`` is only capped by the frame itself (unlike the
    pooled path, whose top level must still hold a full window)."""
    levels = 1
    while (window << (levels - 1)) < src_h:
        levels += 1
    return levels


def window_geometry_frac(
    A_inv: jnp.ndarray,
    out_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    window: int,
    levels: int,
    y_align: int = 8,
):
    """Fractional-scale window geometry: per-face resample factor ``r``.

    The window resamples a DMA strip of ``min(window·2ˡ, H)`` level-0 rows
    (bucket ℓ chosen per face) at the smallest factor that fits the quad,
    ``r = max(1, span/(window−2))``, with plain bilinear point taps — the
    same sampling the exact warp applies — instead of the pooled path's
    2ˡ block average. Crop error vs the exact warp drops accordingly
    (BASELINE.md round-3 fidelity table); at r = 1 the path is
    bitwise-exact. The horizontal axis needs no strip (kernel rows span
    the full width), so only ``span_y``'s bucket gates the DMA size.

    Returns (level (B,) int32 bucket, strip0s (levels, B) int32 LEVEL-0
    strip start rows, r (B,) f32, off_y (B,) f32 strip-relative start,
    x0f (B,) f32 absolute level-0 x start, A_win (B, 2, 3)).
    """
    Hs, Ws = src_hw
    if window % y_align:
        raise ValueError(f"fractional window must be {y_align}-row aligned")
    a, b, c, d, e, f, span_x, span_y, cx, cy = _quad_extent(A_inv, out_size)

    rows_l = [min(window << l, Hs) for l in range(levels)]
    # Quad + one window-px bilinear margin per side + 2 px for the integer
    # floor-snap of the start offsets below: window·r ≥ span + 2r + 2.
    # Ceil to the 2⁻¹⁶ fixed-point grid the Pallas kernel's
    # scalar-prefetch rides, so the XLA path, A_win, and the kernel use
    # the IDENTICAL r.
    r = jnp.maximum(1.0, (jnp.maximum(span_x, span_y) + 2.0) / float(window - 2))
    r = jnp.ceil(r * 65536.0) / 65536.0
    # No height-derived cap on r: a quad wider than the frame HEIGHT
    # (landscape frames) needs window·r > Hs; the top bucket's strip is
    # the whole frame, so vertical taps outside it are genuine
    # out-of-frame rows (border 0) and the window may overhang the frame
    # symmetrically — exactly like the horizontal axis, which never had a
    # strip to fit. (A height cap here truncated wide in-frame quads
    # horizontally — review finding, 2026-08-18.)

    # Bucket ℓ must hold the fractional window plus alignment slack;
    # bucket 0 (rows == window, start forced to the aligned strip origin)
    # additionally accepts r == 1 quads whose span leaves room for the
    # ≤ y_align−1 rows the aligned placement can shift the strip by
    # (span_y + 2·y_align + 2 ≤ window) — the level-0 exact case.
    level = jnp.zeros(a.shape, jnp.int32)
    for l in range(levels - 1):
        fit = window * r + 2.0 * y_align <= rows_l[l]
        if l == 0:
            fit = fit | (
                (r <= 1.0) & (span_y + 2.0 + 2.0 * y_align <= window)
            )
        level = level + (~fit).astype(jnp.int32)

    strip0s = []
    for l in range(levels):
        s_raw = (
            jnp.floor((cy - rows_l[l] / 2) / y_align).astype(jnp.int32) * y_align
        )
        strip0s.append(jnp.clip(s_raw, 0, (Hs - rows_l[l]) // y_align * y_align))

    idx = jnp.arange(level.shape[0])
    strip0 = jnp.stack(strip0s)[level, idx].astype(jnp.float32)
    rows_sel = jnp.asarray(rows_l, jnp.float32)[level]
    # Integer starts keep r == 1 windows bitwise-exact (identity taps);
    # A_win absorbs the snap, so r > 1 fidelity is unaffected. When the
    # fractional window exceeds the strip (window·r > rows_sel, only
    # possible at the top full-frame bucket), slide so the whole frame
    # stays covered — min/max ordering like the x axis below.
    wr_y = window * r
    start_y = jnp.floor(
        jnp.clip(
            cy - wr_y * 0.5,
            jnp.minimum(strip0, strip0 + rows_sel - wr_y),
            jnp.maximum(strip0, strip0 + rows_sel - wr_y),
        )
    )
    off_y = start_y - strip0
    # Keep the window over the frame when the quad would push it outside
    # (out-of-frame taps are zero anyway; sliding in retains real pixels,
    # exactly like the exact warp's border semantics).
    wr = window * r
    x0f = jnp.floor(
        jnp.clip(
            cx - wr * 0.5, jnp.minimum(0.0, Ws - wr), jnp.maximum(0.0, Ws - wr)
        )
    )

    # Window pixel centers sample source y = start + (i + 0.5)·r − 0.5,
    # so src → window is i = (y − start + 0.5 − 0.5r)/r; at r = 2ˡ this is
    # exactly the pooled A_win of window_geometry.
    sh = 0.5 - 0.5 * r
    A_win = jnp.stack(
        [
            jnp.stack([a / r, b / r, (c - x0f + sh) / r], -1),
            jnp.stack([d / r, e / r, (f - start_y + sh) / r], -1),
        ],
        axis=1,
    )
    return level, jnp.stack(strip0s), r, off_y, x0f, A_win


def _frac_crop_xla(images, start_y, x0f, r, window):
    """Reference fractional crop: bilinear point-sampling taps at stride
    ``r`` over the FULL level-0 image as two dense contractions (CPU /
    parity path — the TPU path builds the same taps inside the Pallas
    crop kernel over the DMA'd strip only)."""
    B, Hs, Ws, C = images.shape
    i = jnp.arange(window, dtype=jnp.float32)

    def one(img, sy0, sx0, rr):
        sy = sy0 + (i + 0.5) * rr - 0.5
        sx = sx0 + (i + 0.5) * rr - 0.5
        V = jnp.maximum(
            0.0, 1.0 - jnp.abs(sy[:, None] - jnp.arange(Hs, dtype=jnp.float32))
        )
        H = jnp.maximum(
            0.0, 1.0 - jnp.abs(sx[:, None] - jnp.arange(Ws, dtype=jnp.float32))
        )
        t1 = jnp.einsum("it,twc->iwc", V, img)
        return jnp.einsum("iwc,jw->ijc", t1, H)

    return jax.vmap(one)(images, start_y, x0f, r)


def _crop_window_xla(images, y0, x0, window):
    """Gather-based crop for CPU/parity paths (fine off-TPU)."""

    def one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (window, window, img.shape[2]))

    return jax.vmap(one)(images, y0, x0)


def warp_affine_windowed(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    window: int = 160,
    levels: Optional[int] = None,
    inverse: bool = False,
    use_pallas: Optional[bool] = None,
    frame_indices: Optional[jnp.ndarray] = None,
    fractional: bool = False,
    tap_construction: str = "legacy",
) -> jnp.ndarray:
    """Affine warp via per-image window crop from a mip pyramid.

    Same contract as :func:`warp_affine` with border_value=0, but cost is
    O(window²·output) instead of O(frame²·output): ~3× faster at a 320²
    source and the only affordable route from original-resolution frames.
    Exactly equal to the full warp whenever the output quad (+1px) fits the
    window at level 0; larger faces sample a 2ˡ× average-pooled level.

    ``frame_indices`` (N,) maps each of the N matrices to a source frame in
    ``images`` (multi-face serving: K faces per frame share its pixels with
    no frame replication). Default: identity, N == B.

    ``tap_construction``: tap-weight build for the final warp kernel —
    "legacy" | "uw" | "uw16" (see ops/pallas/warp_kernel.py; the rank-2
    MXU modes cut the measured 2/3-of-kernel VPU construction cost).

    ``fractional``: resample the window at the per-face factor ``r`` that
    exactly fits the quad (bilinear point taps, :func:`window_geometry_frac`)
    instead of the bucketed 2ˡ block average — the same DMA strips, much
    lower crop error for faces larger than the window (BASELINE.md
    round-3 fidelity table), still bitwise-exact at level 0.
    """
    B, Hs, Ws, C = images.shape
    N = matrices.shape[0]
    if fractional:
        if levels is not None:
            raise ValueError(
                "fractional=True derives its strip buckets from the frame "
                "height (frac_window_levels); levels= is not supported"
            )
        if Hs % 16:
            # The 16-aligned strip start (bf16 sublane tile, shared by the
            # XLA path for backend-identical crops) cannot otherwise reach
            # the bottom Hs%16 rows — pad with zero rows, which sample as
            # border 0 exactly (point taps; review finding, 2026-08-18).
            images = jnp.pad(images, ((0, 0), (0, -Hs % 16), (0, 0), (0, 0)))
            Hs += -Hs % 16
    elif levels is None:
        levels = max_window_levels((Hs, Ws), window)
    if min(Hs, Ws) < window:
        raise ValueError(f"window {window} exceeds source {Hs}×{Ws}")
    if Hs % 8 or window % 8:
        raise ValueError("source height and window must be multiples of 8")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    A_inv = matrices if inverse else invert_affine(matrices)

    if use_pallas and fractional:
        from .pallas.warp_kernel import crop_window_frac_pallas, warp_affine_pallas

        images = images.astype(jnp.bfloat16)
        levels_f = frac_window_levels(Hs, window)
        level, strip0s, r, off_y, x0f, A_win = window_geometry_frac(
            A_inv, out_size, (Hs, Ws), window, levels_f, y_align=16
        )
        strip0 = strip0s[level, jnp.arange(N)]
        crop = crop_window_frac_pallas(
            images.reshape(B, Hs, Ws * C), strip0, level, r, off_y, x0f,
            window, C, levels_f, y_align=16, frame_idx=frame_indices,
            construction="legacy" if tap_construction == "legacy" else "mxu",
        ).reshape(N, window, window, C)
        return warp_affine_pallas(crop, A_win, out_size, inverse=True,
                                  construction=tap_construction)
    if use_pallas:
        from .pallas.warp_kernel import crop_window_pool_pallas, warp_affine_pallas

        # bf16 end to end: the downstream warp kernel quantizes pixels to
        # bf16 anyway, and bf16 halves every frame-side HBM pass. bf16
        # VMEM sublane tiles are 16 rows → y_align=16.
        images = images.astype(jnp.bfloat16)
        level, y0s, x0s, A_win = window_geometry(
            A_inv, out_size, (Hs, Ws), window, levels, y_align=16
        )
        # ONE pallas call per batch crops every face's pooled window
        # straight from the level-0 frames (in-kernel 4ˡ-block averaging —
        # no XLA mip pyramid, whose NHWC C=3 pooling ran at 3/128 lane
        # utilization and dominated the round-2 align stage).
        x0_sel = jnp.stack(x0s)[level, jnp.arange(N)]
        y0_sel = jnp.stack(y0s)[level, jnp.arange(N)]
        y0_l0 = jnp.left_shift(y0_sel, level)
        crop = crop_window_pool_pallas(
            images.reshape(B, Hs, Ws * C), y0_l0, x0_sel, level,
            window, C, levels, y_align=16, frame_idx=frame_indices,
            construction="legacy" if tap_construction == "legacy" else "mxu",
        ).reshape(N, window, window, C)
        return warp_affine_pallas(crop, A_win, out_size, inverse=True,
                                  construction=tap_construction)

    images = images.astype(jnp.float32)
    if frame_indices is not None:
        images = jnp.take(images, frame_indices, axis=0)
    if fractional:
        # y_align 16 matches the TPU branch so crops are backend-identical.
        level, strip0s, r, off_y, x0f, A_win = window_geometry_frac(
            A_inv, out_size, (Hs, Ws), window, frac_window_levels(Hs, window),
            y_align=16,
        )
        idx = jnp.arange(level.shape[0])
        strip0 = strip0s[level, idx].astype(jnp.float32)
        crop = _frac_crop_xla(images, strip0 + off_y, x0f, r, window)
        return warp_affine(crop, A_win, out_size, inverse=True)
    level, y0s, x0s, A_win = window_geometry(
        A_inv, out_size, (Hs, Ws), window, levels
    )
    pyr = images
    crop = None
    for l in range(levels):
        cand = _crop_window_xla(pyr, y0s[l], x0s[l], window)
        crop = cand if crop is None else jnp.where(
            (level == l)[:, None, None, None], cand, crop
        )
        if l + 1 < levels:
            pyr = _avg_pool2(pyr)
    return warp_affine(crop, A_win, out_size, inverse=True)


def warp_affine_auto(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    inverse: bool = False,
    tap_construction: str = "legacy",
) -> jnp.ndarray:
    """Platform-dispatched warp: Pallas kernel on TPU (11× the XLA gather on
    v5e), exact gather formulation elsewhere (CPU tests, parity checks)."""
    if jax.default_backend() == "tpu":
        from .pallas.warp_kernel import warp_affine_pallas

        return warp_affine_pallas(images, matrices, out_size, inverse=inverse,
                                  construction=tap_construction)
    return warp_affine(images, matrices, out_size, inverse=inverse)


def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: Tuple[int, int],
    border_value: float = 0.0,
) -> jnp.ndarray:
    """Batched box crop + bilinear resize expressed as an affine warp.

    boxes: (B, 4) [x1, y1, x2, y2] in source pixels.
    """
    Ho, Wo = out_size
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sx = (x2 - x1) / Wo
    sy = (y2 - y1) / Ho
    zeros = jnp.zeros_like(sx)
    # dst→src mapping directly (inverse=True).
    A_inv = jnp.stack(
        [jnp.stack([sx, zeros, x1], -1), jnp.stack([zeros, sy, y1], -1)], axis=1
    )
    return warp_affine(images, A_inv, out_size, border_value, inverse=True)
