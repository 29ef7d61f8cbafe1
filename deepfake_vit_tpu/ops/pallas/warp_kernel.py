"""Pallas TPU kernel: batched affine bilinear warp, gather-free.

Why a kernel: XLA lowers 2-D computed-index gathers catastrophically on TPU
(~170 ms for a 64×320²→224² batch on v5e) and the XLA one-hot-matmul
reformulation (ops/warp.py::warp_affine_matmul) is HBM-bound on its
(pixels × source-width) intermediate (~90 ms). This kernel keeps that
intermediate in VMEM:

For each (image, 16-row output chunk) grid cell, with everything built
lane-major (output pixels on lanes — no in-kernel relayouts):

    V_T[t, p] = tri(sy[p] − t)          vertical 2-tap weights  (iota only)
    P_T[s, p] = Σ_t imgT[s, t]·V_T[t,p] MXU matmul (K = source height)
    H_T[s, p] = tri(sx[p] − s)          horizontal 2-tap weights
    out[p]    = Σ_s P_T[s,p]·H_T[s,p]   VPU multiply + sublane reduce

Border semantics match cv2 BORDER_CONSTANT=0 exactly: out-of-image taps
get zero tri-weight. fp32 accumulation; tap weights and pixels in bf16
(≤1/255 relative error on uint8-range images — exactness available via the
XLA fp32 path in ops/warp.py).

The source image is pre-transposed once by XLA to (B, C, Ws, Hs) so the
matmul needs no in-kernel transpose or dynamic lane slicing.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..umeyama import invert_affine


def _auto_row_chunk(Hs: int, Ws: int, Wo: int, C: int,
                    budget_units: int = 2_500_000) -> int:
    """Largest output-row chunk whose per-cell tap planes fit the 16 MB
    scoped-VMEM stack. The dominant allocations scale with (Hs + Ws)·R·Wo
    (the V/H construction chains); the budget is CALIBRATED to the
    measured boundary on v5e: (160+160)·32·224 ≈ 2.3M units compiles and
    runs, (320+320)·32·224 ≈ 4.6M OOMs (the round-3 preprocess
    regression this function guards against), (320+320)·16·224 ≈ 2.3M is
    the long-standing round-2 production point."""
    for R in (32, 16, 8, 4, 2, 1):
        if (Hs + Ws) * R * Wo <= budget_units:
            return R
    return 1


def _warp_kernel(coef_ref, imgT_ref, tconst_ref, sconst_ref, out_ref, *,
                 R: int, Ho: int, Wo: int, Hs: int, Ws: int, C: int):
    k = pl.program_id(1)
    a = coef_ref[0, 0, 0]
    b = coef_ref[0, 0, 1]
    c = coef_ref[0, 0, 2]
    d = coef_ref[0, 0, 3]
    e = coef_ref[0, 0, 4]
    f = coef_ref[0, 0, 5]

    n = R * Wo
    # Output pixel index p (lane-major row vector): i = p // Wo, j = p % Wo.
    p = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    i = (p // Wo).astype(jnp.float32) + (k * R).astype(jnp.float32)
    j = (p % Wo).astype(jnp.float32)
    sx = a * j + b * i + c  # (1, n) source x per output pixel
    sy = d * j + e * i + f  # (1, n) source y

    # Tap-weight construction dominates this kernel (probe: 8.2 of 12.9 ms
    # at B=128 — VPU passes over two (window, n) planes per cell), so the
    # row/column index planes arrive as CONSTANT bf16 inputs (integers
    # ≤ window are bf16-exact; the f32 subtraction promotes) instead of two
    # per-cell iota+cast passes.

    # Vertical taps: V_T (Hs, n); tri-weight ⇒ BORDER_CONSTANT=0.
    # (An early-bf16 variant of this chain measured the same — the VPU runs
    # bf16 elementwise at f32 rate here; construction cost is pass count.)
    V = jnp.maximum(0.0, 1.0 - jnp.abs(sy - tconst_ref[...])).astype(jnp.bfloat16)

    # Horizontal taps: H_T (Ws, n), bf16 to halve the matmul-side traffic.
    H = jnp.maximum(0.0, 1.0 - jnp.abs(sx - sconst_ref[...])).astype(jnp.bfloat16)

    # ONE channel-stacked matmul: (C·Ws, Hs) @ (Hs, n). M = C·Ws fills the
    # MXU's 128-row passes (~94% M-utilization at C=3, Ws=160) where the
    # per-channel M=160 variant wasted 38% of every pass on tile padding.
    imgT = imgT_ref[0].reshape(C * Ws, Hs)
    P = jax.lax.dot_general(
        imgT, V,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # (C·Ws, n)
    ones = jnp.ones((1, Ws), jnp.bfloat16)
    for ch in range(C):
        # Σ_s as an MXU row-sum (bf16 products, f32 accumulation) — a VPU
        # sublane reduce would materialize an (Ws, n) f32 upcast per channel.
        out_ref[0, 0, ch, :] = jax.lax.dot_general(
            ones, P[ch * Ws:(ch + 1) * Ws] * H,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]


@partial(jax.jit, static_argnames=("out_size", "inverse", "row_chunk"))
def warp_affine_pallas(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    inverse: bool = False,
    row_chunk: int = None,
) -> jnp.ndarray:
    """Batched cv2.warpAffine equivalent (bilinear, border 0) as a TPU kernel.

    images: (B, Hs, Ws, C) float; matrices: (B, 2, 3) src→dst affines
    (inverted internally unless ``inverse``). Returns (B, Ho, Wo, C) f32.

    NOTE a source-row-windowed variant (dynamic sublane slice + in-kernel
    transpose to cut the matmul K dim) was built and measured 17× SLOWER
    than this full-K version — Mosaic lowers the per-program transpose and
    dynamically-offset loads far worse than one big static matmul. Keep the
    contraction static.
    """
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_size
    if row_chunk is None:
        # The V/H tap planes scale with (source size × R·Wo); big chunks
        # amortize per-cell overheads for window-sized crops but blow the
        # 16 MB scoped-VMEM stack for full-frame sources.
        row_chunk = _auto_row_chunk(Hs, Ws, Wo, C)
    R = row_chunk
    while Ho % R != 0:
        R //= 2
    n_chunks = Ho // R

    A_inv = matrices if inverse else invert_affine(matrices)
    coeffs = jnp.concatenate(
        [A_inv.reshape(B, 6), jnp.zeros((B, 2), A_inv.dtype)], axis=1
    ).astype(jnp.float32).reshape(B, 1, 8)

    common = dict(
        grid=(B, n_chunks),
        out_specs=pl.BlockSpec((1, 1, C, R * Wo), lambda bi, ki: (bi, ki, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_chunks, C, R * Wo), jnp.float32),
    )

    kernel = partial(_warp_kernel, R=R, Ho=Ho, Wo=Wo, Hs=Hs, Ws=Ws, C=C)
    imgT = jnp.transpose(images.astype(jnp.bfloat16), (0, 3, 2, 1))  # (B,C,Ws,Hs)
    n = R * Wo
    tconst = jnp.broadcast_to(
        jnp.arange(Hs, dtype=jnp.bfloat16)[:, None], (Hs, n)
    )
    sconst = jnp.broadcast_to(
        jnp.arange(Ws, dtype=jnp.bfloat16)[:, None], (Ws, n)
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, Ws, Hs), lambda bi, ki: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hs, n), lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ws, n), lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_chunks * C * Ws * Hs * R * Wo,
            bytes_accessed=B * C * Ws * Hs * 2 + B * C * Ho * Wo * 4,
            transcendentals=0,
        ),
        **common,
    )(coeffs, imgT, tconst, sconst)

    # (B, n_chunks, C, R·Wo) → (B, Ho, Wo, C)
    out = out.reshape(B, n_chunks, C, R, Wo)
    return jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(B, Ho, Wo, C)


# ---------------------------------------------------------------------------
# Windowed crop: per-image dynamic offsets without gathers
# ---------------------------------------------------------------------------


def _crop_pool_kernel(
    y0_ref, x0_ref, lvl_ref, fi_ref, img_ref, out_ref, strip_ref, sem, *,
    window: int, H: int, WC: int, C: int, levels: int, y_align: int,
):
    """One grid cell per image: DMA ``window·2ˡ`` LEVEL-0 rows of the
    selected mip level's support, then pool+crop to (window, window·C) with
    two MXU matmuls — no pyramid materialization, no lane rotation (the
    dynamic column offset is baked into the horizontal selection matrix, so
    this lowers for any dtype; pltpu.roll is 32-bit-only on this Mosaic).

    Vertical: Vp[o, r] = 2⁻ˡ · [r>>l == o]        (window, rows) static
    Horizontal: Hp[s, j] = 2⁻ˡ · [(s//C)>>l == x0 + j//C] · [s%C == j%C]
    crop = Vp @ strip @ Hp — exact 4ˡ-block averaging, identical to l
    applications of ``_avg_pool2`` followed by the window crop.
    """
    b = pl.program_id(0)

    for l in range(levels):
        rows = window << l

        @pl.when(lvl_ref[b] == l)
        def _(l=l, rows=rows):
            cp = pltpu.make_async_copy(
                img_ref.at[
                    fi_ref[b], pl.ds(pl.multiple_of(y0_ref[b], y_align), rows), :
                ],
                strip_ref.at[:rows],
                sem,
            )
            cp.start()
            cp.wait()
            inv = 1.0 / (1 << l)

            r_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 1)
            o_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 0)
            dt = out_ref.dtype
            Vp = jnp.where((r_i >> l) == o_i, inv, 0.0).astype(dt)
            t1 = jax.lax.dot_general(
                Vp, strip_ref[:rows],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # (window, WC)

            WcC = window * C
            s_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 0)
            j_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 1)
            sx = s_i // C
            sc = s_i - sx * C
            jx = j_i // C
            jc = j_i - jx * C
            Hp = jnp.where(
                ((sx >> l) == (jx + x0_ref[b])) & (sc == jc), inv, 0.0
            ).astype(dt)
            out_ref[0] = jax.lax.dot_general(
                t1, Hp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("window", "channels", "levels", "y_align"))
def crop_window_pool_pallas(
    frames_flat: jnp.ndarray, y0_l0: jnp.ndarray, x0: jnp.ndarray,
    level: jnp.ndarray, window: int, channels: int, levels: int,
    y_align: int = 16, frame_idx: jnp.ndarray = None,
) -> jnp.ndarray:
    """Per-image pooled window crops straight from level-0 frames.

    frames_flat: (B, H, W·C) row-flattened frames (any width — no lane
        padding needed; the column offset rides the selection matmul).
    y0_l0: (N,) int32 LEVEL-0 row offsets (selected-level y0 << level,
        ``y_align``-aligned); x0: (N,) selected-LEVEL column offsets;
    level: (N,) int32. ``frame_idx`` (N,) maps each output crop to its
    source frame (multi-face serving: K crops share one frame without
    materializing K frame copies); default identity (N == B).
    Returns (N, window, window·C) in the frame dtype.

    Replaces the XLA mip pyramid + level crops + select of the round-2
    windowed warp (~13 ms of the 24.9 ms align stage at B=128: pooling at
    NHWC C=3 uses 3/128 lanes; here pooling is two dense MXU contractions
    inside the crop cell, and only the selected level's support rows ever
    leave HBM).
    """
    B, H, WC = frames_flat.shape
    # HBM DMA slices need a 128-multiple lane width; pad when W·C isn't
    # (e.g. 320·3 = 960). Padded lanes decode to source x ≥ the frame width
    # at every level, so the horizontal selection matrix never picks them.
    WCp = -(-WC // 128) * 128
    if WCp != WC:
        frames_flat = jnp.pad(frames_flat, ((0, 0), (0, 0), (0, WCp - WC)))
        WC = WCp
    if frame_idx is None:
        frame_idx = jnp.arange(y0_l0.shape[0], dtype=jnp.int32)
    N = y0_l0.shape[0]
    WcC = window * channels

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, window, WcC), lambda b, y0, x0, lvl, fi: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((window << (levels - 1), WC), frames_flat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(_crop_pool_kernel, window=window, H=H, WC=WC, C=channels,
                levels=levels, y_align=y_align),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, window, WcC), frames_flat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * window * WC * ((window << (levels - 1)) + WcC),
            bytes_accessed=N * window * (WC + WcC) * frames_flat.dtype.itemsize,
            transcendentals=0,
        ),
    )
    return out(y0_l0.astype(jnp.int32), x0.astype(jnp.int32),
               level.astype(jnp.int32), frame_idx.astype(jnp.int32),
               frames_flat)


def _crop_frac_kernel(
    s0_ref, lvl_ref, fi_ref, rfp_ref, offy_ref, x0_ref,
    img_ref, out_ref, strip_ref, sem, *,
    window: int, H: int, WC: int, C: int, levels: int, y_align: int,
):
    """Fractional-scale window crop (ops/warp.py::window_geometry_frac):
    DMA ``min(window·2ˡ, H)`` level-0 rows, then resample to (window,
    window·C) at per-face stride ``r`` (2⁻¹⁶ fixed-point scalar) with
    bilinear point taps — the two selection matmuls of the pooled kernel
    with tri() weights instead of block-average indicators:

    V[o, t] = tri(off_y + (o+0.5)·r − 0.5 − t)          (window, rows)
    Hx[s, j] = tri(x0 + (jx+0.5)·r − 0.5 − sx) · [sc == jc]
    crop = V @ strip @ Hx — identity (bitwise-exact crop) when r == 1,
    since the geometry snaps starts to integers.
    """
    b = pl.program_id(0)
    r = rfp_ref[b].astype(jnp.float32) * (1.0 / 65536.0)
    offy = offy_ref[b].astype(jnp.float32)
    x0 = x0_ref[b].astype(jnp.float32)

    for l in range(levels):
        rows = min(window << l, H)

        @pl.when(lvl_ref[b] == l)
        def _(rows=rows):
            cp = pltpu.make_async_copy(
                img_ref.at[
                    fi_ref[b], pl.ds(pl.multiple_of(s0_ref[b], y_align), rows), :
                ],
                strip_ref.at[:rows],
                sem,
            )
            cp.start()
            cp.wait()
            dt = out_ref.dtype

            o_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 0)
            t_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 1)
            sy = offy + (o_i.astype(jnp.float32) + 0.5) * r - 0.5
            V = jnp.maximum(
                0.0, 1.0 - jnp.abs(sy - t_i.astype(jnp.float32))
            ).astype(dt)
            t1 = jax.lax.dot_general(
                V, strip_ref[:rows],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # (window, WC)

            WcC = window * C
            s_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 0)
            j_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 1)
            sx = s_i // C
            sc = s_i - sx * C
            jx = j_i // C
            jc = j_i - jx * C
            sxj = x0 + (jx.astype(jnp.float32) + 0.5) * r - 0.5
            Hx = jnp.where(
                sc == jc,
                jnp.maximum(0.0, 1.0 - jnp.abs(sxj - sx.astype(jnp.float32))),
                0.0,
            ).astype(dt)
            out_ref[0] = jax.lax.dot_general(
                t1, Hx,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("window", "channels", "levels", "y_align"))
def crop_window_frac_pallas(
    frames_flat: jnp.ndarray, strip0: jnp.ndarray, level: jnp.ndarray,
    r: jnp.ndarray, off_y: jnp.ndarray, x0f: jnp.ndarray,
    window: int, channels: int, levels: int,
    y_align: int = 16, frame_idx: jnp.ndarray = None,
) -> jnp.ndarray:
    """Fractional-scale sibling of :func:`crop_window_pool_pallas`.

    frames_flat: (B, H, W·C) row-flattened frames; strip0/level/off_y/x0f/r
    from ``window_geometry_frac`` (strip0 selected per face, LEVEL-0 rows;
    off_y and x0f are integer-valued floats; r carries the 2⁻¹⁶-quantized
    resample factor). Returns (N, window, window·C) in the frame dtype.
    """
    B, H, WC = frames_flat.shape
    WCp = -(-WC // 128) * 128
    if WCp != WC:
        frames_flat = jnp.pad(frames_flat, ((0, 0), (0, 0), (0, WCp - WC)))
        WC = WCp
    if frame_idx is None:
        frame_idx = jnp.arange(strip0.shape[0], dtype=jnp.int32)
    N = strip0.shape[0]
    WcC = window * channels
    rows_top = min(window << (levels - 1), H)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, window, WcC), lambda b, s0, lvl, fi, rfp, oy, x0: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_top, WC), frames_flat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(_crop_frac_kernel, window=window, H=H, WC=WC, C=channels,
                levels=levels, y_align=y_align),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, window, WcC), frames_flat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * window * WC * (rows_top + WcC),
            bytes_accessed=N * window * (WC + WcC) * frames_flat.dtype.itemsize,
            transcendentals=0,
        ),
    )
    rfp = jnp.round(r * 65536.0).astype(jnp.int32)
    return out(strip0.astype(jnp.int32), level.astype(jnp.int32),
               frame_idx.astype(jnp.int32), rfp,
               off_y.astype(jnp.int32), x0f.astype(jnp.int32),
               frames_flat)
