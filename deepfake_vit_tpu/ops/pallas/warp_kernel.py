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
                    budget_units: int = 2_500_000,
                    live_planes: int = 2) -> int:
    """Largest output-row chunk whose per-cell tap planes fit the 16 MB
    scoped-VMEM stack. The dominant allocations scale with (Hs + Ws)·R·Wo
    (the V/H construction chains); the budget is CALIBRATED to the
    measured boundary on v5e: (160+160)·32·224 ≈ 2.3M units compiles and
    runs, (320+320)·32·224 ≈ 4.6M OOMs (the round-3 preprocess
    regression this function guards against), (320+320)·16·224 ≈ 2.3M is
    the long-standing round-2 production point. ``live_planes`` scales the
    model for construction modes whose peak holds more simultaneous f32
    tap planes than the legacy chain's two."""
    for R in (32, 16, 8, 4, 2, 1):
        if (Hs + Ws) * R * Wo * live_planes <= budget_units * 2:
            return R
    return 1


def _tri_uw_lhs(coords, dtype, scale: float = 1.0, bias: float = 0.0,
                valid: int = None) -> "jnp.ndarray":
    """Constant LHS for the rank-1 tap construction (see _warp_kernel):
    rows [+σ, σ(1−t)+β, 0…], so with the shared RHS [[s], [1], 0…] one
    MXU matmul yields U[t] = σ·(1 − (s − t)) + β, and with c = σ + β the
    tri taps follow from ONE plane: since the W companion satisfies
    W = 2c − U identically (U + W = 2σ + 2β), max(0, min(U, W)) =
    max(β, c − |U − c|) — at σ=1, β=0 bitwise the classic max(0, 1−|d|);
    σ=127, β=0.5 bakes the int8 quantization (+0.5 so the truncating
    float→int8 convert rounds; out-of-support values land at β=0.5 and
    truncate to 0). Round 4: the stacked 2-block [U; W] form made the
    matmul output the largest scoped-VMEM stack tensor — the crop kernels
    OOMed the 16 MB limit by 4.15 MB at WC=1920 — so the W block is gone.
    K is padded to the f32 sublane tile (8). Rows ≥ ``valid`` (source
    padding) get [0, −1] — U = −1 → c − |−1 − c| = −1 → tap β → 0 —
    needed whenever padded source rows are NOT zero pixels (the int8
    mode's shifted pixels decode pad zeros as 128).

    ``coords``: an int (rows are arange(coords)) or a 1-D coordinate
    vector — the crop kernels pass sx = lane//C (and sx>>l per level) so
    the same helper builds every U LHS in this module."""
    import numpy as np  # host-side constant

    t = (np.arange(coords, dtype=np.float32) if isinstance(coords, int)
         else np.asarray(coords, np.float32))
    size = t.shape[0]
    lhs = np.zeros((size, 8), np.float32)
    lhs[:, 0] = scale
    lhs[:, 1] = scale * (1.0 - t) + bias
    if valid is not None and valid < size:
        lhs[valid:, 0] = 0.0
        lhs[valid:, 1] = -1.0
    # Host numpy, NOT jnp: this runs inside jitted wrappers where a jnp
    # constant would become a tracer the numpy-side stacking can't consume.
    return lhs.astype(np.dtype(dtype))


def _tri_from_u(U, c: float, beta: float = 0.0):
    """tri taps from the U plane alone: max(β, c − |U − c|) (see
    _tri_uw_lhs). One abs + one sub + one max — fewer VPU passes than the
    two-block min/max AND half the matmul-output stack footprint."""
    return jnp.maximum(c - jnp.abs(U - c), beta)


def _warp_kernel(coef_ref, imgT_ref, tconst_ref, sconst_ref, out_ref, *,
                 R: int, Ho: int, Wo: int, Hs: int, Ws: int, C: int,
                 construction: str = "legacy"):
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
    # at B=128 — VPU passes over two (window, n) planes per cell).
    if construction == "legacy":
        # Row/column index planes arrive as CONSTANT bf16 inputs (integers
        # ≤ window are bf16-exact; the f32 subtraction promotes): 5 VPU
        # passes per plane (sub, abs, rsub, max, cast). (An early-bf16
        # variant measured the same — the VPU runs bf16 elementwise at f32
        # rate here; construction cost is pass count.)
        # Vertical taps: V_T (Hs, n); tri-weight ⇒ BORDER_CONSTANT=0.
        V = jnp.maximum(
            0.0, 1.0 - jnp.abs(sy - tconst_ref[...])
        ).astype(jnp.bfloat16)
        # Horizontal taps: H_T (Ws, n), bf16 to halve matmul-side traffic.
        H = jnp.maximum(
            0.0, 1.0 - jnp.abs(sx - sconst_ref[...])
        ).astype(jnp.bfloat16)
    else:
        # Rank-1 MXU construction (_tri_uw_lhs): one (size, 8)@(8, n)
        # matmul emits U = σ(1−(s−t))+β; tri follows from the single U
        # plane as max(β, c−|U−c|) with c = σ+β (the W companion is
        # identically 2c−U, so it never needs its own matmul rows — see
        # _tri_from_u). Fewer VPU passes than the legacy 5 AND half the
        # matmul-output stack footprint vs the round-3 [U; W] form (the
        # crop kernels OOMed the 16 MB scoped-VMEM limit with it). "uw"
        # keeps the tri plane f32; "uw16" rounds it to bf16 (one extra
        # bf16 rounding at the |d|≈0 boundary, ulp(1)=2⁻⁷ — the same
        # class as the legacy chain's final cast); "int8" bakes σ=127,
        # β=0.5 so the truncating float→int8 convert rounds, and the
        # channel-stacked matmul runs s8×s8→s32 at 2× the bf16 MXU rate.
        # Mosaic (real backend, v5e) rejects non-32-bit matmul
        # accumulators, so the MXU always accumulates f32.
        ones = jnp.ones((1, n), jnp.float32)
        zeros = jnp.zeros((6, n), jnp.float32)
        rhs_y = jnp.concatenate([sy, ones, zeros], axis=0)  # (8, n)
        U = jax.lax.dot_general(
            tconst_ref[...], rhs_y,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if construction == "int8":
            # q7 taps: trunc(127·tri + 0.5) = round; out-of-support and
            # invalid-row values land at β=0.5 and truncate to 0.
            V = _tri_from_u(U, 127.5, 0.5).astype(jnp.int8)
        else:
            V = _tri_from_u(U, 1.0).astype(jnp.bfloat16)
        rhs_x = jnp.concatenate([sx, ones, zeros], axis=0)
        Ux = jax.lax.dot_general(
            sconst_ref[...], rhs_x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        H = _tri_from_u(Ux, 1.0).astype(jnp.bfloat16)

    # ONE channel-stacked matmul: (C·Ws, Hs) @ (Hs, n). M = C·Ws fills the
    # MXU's 128-row passes (~94% M-utilization at C=3, Ws=160) where the
    # per-channel M=160 variant wasted 38% of every pass on tile padding.
    imgT = imgT_ref[0].reshape(C * Ws, Hs)
    if construction == "int8":
        # imgT is s8 = pixel − 128 (exact: uint8-range integers). The shift
        # re-enters through the separable correction 128·(Σ_t V)·(Σ_s H)
        # — pad rows/cols carry [0, −1] LHS rows (always-zero taps), since
        # in shifted space pad zeros decode to pixel 128, not border 0.
        P = jax.lax.dot_general(
            imgT, V,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16)  # (C·Ws, n), ×127 scale
        colV = jax.lax.dot_general(
            jnp.ones((1, Hs), jnp.int8), V,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (1, n), ×127 scale
        colH = jax.lax.dot_general(
            jnp.ones((1, Ws), jnp.bfloat16), H,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, n)
        corr = (128.0 * colV * colH)[0]
        ones = jnp.ones((1, Ws), jnp.bfloat16)
        for ch in range(C):
            acc_row = jax.lax.dot_general(
                ones, P[ch * Ws:(ch + 1) * Ws] * H,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
            out_ref[0, 0, ch, :] = (acc_row + corr) * (1.0 / 127.0)
    else:
        P = jax.lax.dot_general(
            imgT, V,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (C·Ws, n)
        ones = jnp.ones((1, Ws), jnp.bfloat16)
        for ch in range(C):
            # Σ_s as an MXU row-sum (bf16 products, f32 accumulation) — a
            # VPU sublane reduce would materialize an (Ws, n) f32 upcast
            # per channel.
            out_ref[0, 0, ch, :] = jax.lax.dot_general(
                ones, P[ch * Ws:(ch + 1) * Ws] * H,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]


@partial(jax.jit, static_argnames=("out_size", "inverse", "row_chunk",
                                   "construction"))
def warp_affine_pallas(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    inverse: bool = False,
    row_chunk: int = None,
    construction: str = "legacy",
) -> jnp.ndarray:
    """Batched cv2.warpAffine equivalent (bilinear, border 0) as a TPU kernel.

    images: (B, Hs, Ws, C) float; matrices: (B, 2, 3) src→dst affines
    (inverted internally unless ``inverse``). Returns (B, Ho, Wo, C) f32.

    ``construction`` selects the tap-weight build (the measured 2/3 cost of
    this kernel): "legacy" (5 VPU passes per plane), "uw" (rank-1 MXU U
    plane + abs chain — tap values identical up to FMA association),
    "uw16" (same, bf16 tap rounding), "int8" (rank-1
    construction + q7 V taps and shifted-s8 pixels so the channel-stacked
    matmul runs s8×s8→s32 at 2× the bf16 MXU rate; tap quantization error
    2⁻⁷ — roughly 2× the bf16 tap class, ≤ ~2 units on 0-255 output).

    NOTE a source-row-windowed variant (dynamic sublane slice + in-kernel
    transpose to cut the matmul K dim) was built and measured 17× SLOWER
    than this full-K version — Mosaic lowers the per-program transpose and
    dynamically-offset loads far worse than one big static matmul. Keep the
    contraction static.
    """
    if construction not in ("legacy", "uw", "uw16", "int8"):
        raise ValueError(f"unknown tap construction {construction!r}")
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_size
    Hs_valid, Ws_valid = Hs, Ws
    if construction != "legacy":
        # The U LHS rows pad to sublane tiles: pad sources to the bf16 tile (16;
        # 32 for the s8 image layout). Zero-pixel pad rows/cols contribute
        # nothing in the bf16 modes; the int8 mode zeroes their taps via
        # the ``valid`` LHS rows instead (shifted pads aren't zero pixels).
        tile = 32 if construction == "int8" else 16
        Hp, Wp = -(-Hs // tile) * tile, -(-Ws // tile) * tile
        if (Hp, Wp) != (Hs, Ws):
            images = jnp.pad(
                images, ((0, 0), (0, Hp - Hs), (0, Wp - Ws), (0, 0))
            )
            Hs, Ws = Hp, Wp
    if row_chunk is None:
        # The V/H tap planes scale with (source size × R·Wo); big chunks
        # amortize per-cell overheads for window-sized crops but blow the
        # 16 MB scoped-VMEM stack for full-frame sources. The rank-1 U
        # construction peaks at 2 f32 planes (U + |U−c|), same as legacy.
        row_chunk = _auto_row_chunk(Hs, Ws, Wo, C, live_planes=2)
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

    kernel = partial(_warp_kernel, R=R, Ho=Ho, Wo=Wo, Hs=Hs, Ws=Ws, C=C,
                     construction=construction)
    if construction == "int8":
        # Shifted-s8 pixels: round(pixel) − 128 is exact for uint8-range
        # images (the bf16 path quantizes ≥128 to the same integer grid).
        imgT = jnp.transpose(
            jnp.clip(
                jnp.round(images.astype(jnp.float32)) - 128.0, -128.0, 127.0
            ).astype(jnp.int8),
            (0, 3, 2, 1),
        )  # (B, C, Ws, Hs) s8
    else:
        imgT = jnp.transpose(
            images.astype(jnp.bfloat16), (0, 3, 2, 1)
        )  # (B, C, Ws, Hs)
    n = R * Wo
    if construction == "legacy":
        tconst = jnp.broadcast_to(
            jnp.arange(Hs, dtype=jnp.bfloat16)[:, None], (Hs, n)
        )
        sconst = jnp.broadcast_to(
            jnp.arange(Ws, dtype=jnp.bfloat16)[:, None], (Ws, n)
        )
    elif construction == "int8":
        tconst = _tri_uw_lhs(Hs, jnp.float32, scale=127.0, bias=0.5,
                             valid=Hs_valid)  # (Hs, 8), q7 V taps
        sconst = _tri_uw_lhs(Ws, jnp.float32, valid=Ws_valid)  # (Ws, 8)
    else:
        tconst = _tri_uw_lhs(Hs, jnp.float32)  # (Hs, 8)
        sconst = _tri_uw_lhs(Ws, jnp.float32)  # (Ws, 8)
    t_spec = (pl.BlockSpec(tconst.shape, lambda bi, ki: (0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec(sconst.shape, lambda bi, ki: (0, 0),
                           memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, Ws, Hs), lambda bi, ki: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *t_spec,
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
    y0_ref, x0_ref, lvl_ref, fi_ref, img_ref, *rest,
    window: int, H: int, WC: int, C: int, levels: int, y_align: int,
    construction: str = "mxu",
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

    ``construction`` "mxu": Vp arrives as a CONSTANT per-level plane (4⁻ˡ
    folded in — pow-2 scaling keeps t1's rounding bitwise), and Hp is
    tri((sx>>l) − jx − x0)·mask — for integer arguments tri IS the
    equality indicator — via the rank-1 U matmul with per-level constant
    LHS (sx>>l baked in): the per-face iota + div/mod + shift + compare
    passes collapse to abs/max/mul over the plane. "legacy" keeps the
    original per-face construction.
    """
    b = pl.program_id(0)
    WcC = window * C
    if construction == "legacy":
        out_ref, strip_ref, sem = rest
    else:
        vp_ref, uwlhs_ref, jxrow_ref, mask_ref, out_ref, strip_ref, sem = rest

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
            dt = out_ref.dtype

            if construction == "legacy":
                r_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 1)
                o_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 0)
                Vp = jnp.where((r_i >> l) == o_i, inv, 0.0).astype(dt)
            else:
                Vp = vp_ref[l][:, :rows]  # const, 4⁻ˡ pre-folded
            t1 = jax.lax.dot_general(
                Vp, strip_ref[:rows],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # (window, WC)

            if construction == "legacy":
                s_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 0)
                j_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 1)
                sx = s_i // C
                sc = s_i - sx * C
                jx = j_i // C
                jc = j_i - jx * C
                Hp = jnp.where(
                    ((sx >> l) == (jx + x0_ref[b])) & (sc == jc), inv, 0.0
                ).astype(dt)
            else:
                x0v = x0_ref[b].astype(jnp.float32)
                rhs = jnp.concatenate(
                    [jxrow_ref[...] + x0v,
                     jnp.ones((1, WcC), jnp.float32),
                     jnp.zeros((6, WcC), jnp.float32)], axis=0
                )  # (8, WcC): shared RHS [[jx + x0], [1], 0…]
                # Rank-1 U plane (f32 acc — Mosaic requires 32-bit);
                # tri(d) at integer d is exactly the block indicator
                # [d == 0] (_tri_from_u). The W block would double the
                # largest stack tensor for nothing (W = 2−U).
                U = jax.lax.dot_general(
                    uwlhs_ref[l], rhs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                Hp = (
                    _tri_from_u(U, 1.0).astype(jnp.bfloat16) * mask_ref[...]
                ).astype(dt)
            out_ref[0] = jax.lax.dot_general(
                t1, Hp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("window", "channels", "levels", "y_align",
                                   "construction"))
def crop_window_pool_pallas(
    frames_flat: jnp.ndarray, y0_l0: jnp.ndarray, x0: jnp.ndarray,
    level: jnp.ndarray, window: int, channels: int, levels: int,
    y_align: int = 16, frame_idx: jnp.ndarray = None,
    construction: str = "mxu",
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
    if construction not in ("legacy", "mxu"):
        raise ValueError(f"unknown crop construction {construction!r}")
    if frame_idx is None:
        frame_idx = jnp.arange(y0_l0.shape[0], dtype=jnp.int32)
    N = y0_l0.shape[0]
    C = channels
    WcC = window * C
    rows_top = window << (levels - 1)

    import numpy as np  # host-side constants

    # Constants for the mxu construction ONLY (the legacy path must not pay
    # their VMEM residency/DMA): per-level Vp planes (4⁻ˡ folded — pow-2
    # exact, so t1's bf16 rounding is bitwise the legacy value), per-level
    # rank-1 U LHS with sx>>l baked in (_tri_uw_lhs), the output-lane x
    # index row, and the channel-phase mask (level-independent once 4⁻ˡ is
    # in Vp).
    extra_ops, extra_specs = [], []
    if construction == "mxu":
        vp = np.zeros((levels, window, rows_top), np.float32)
        for l in range(levels):
            rr = np.arange(window << l)
            vp[l, rr >> l, rr] = 0.25 ** l
        sxv = np.arange(WC, dtype=np.int64) // C
        uwlhs = np.stack(
            [_tri_uw_lhs(sxv >> l, jnp.float32) for l in range(levels)]
        )
        jxrow = (np.arange(WcC, dtype=np.int64) // C).astype(np.float32)[None]
        mask = (
            (np.arange(WC, dtype=np.int64) % C)[:, None]
            == (np.arange(WcC, dtype=np.int64) % C)[None, :]
        )
        extra_ops = [
            jnp.asarray(vp, frames_flat.dtype), jnp.asarray(uwlhs),
            jnp.asarray(jxrow), jnp.asarray(mask, jnp.bfloat16),
        ]
        extra_specs = [
            pl.BlockSpec((levels, window, rows_top),
                         lambda b, y0, x0, lvl, fi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, WC, 8),
                         lambda b, y0, x0, lvl, fi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WcC), lambda b, y0, x0, lvl, fi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WC, WcC), lambda b, y0, x0, lvl, fi: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), *extra_specs],
        out_specs=pl.BlockSpec(
            (1, window, WcC), lambda b, y0, x0, lvl, fi: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_top, WC), frames_flat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(_crop_pool_kernel, window=window, H=H, WC=WC, C=channels,
                levels=levels, y_align=y_align, construction=construction),
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
               frames_flat, *extra_ops)


def _crop_frac_kernel(
    s0_ref, lvl_ref, fi_ref, rfp_ref, offy_ref, x0_ref,
    img_ref, *rest,
    window: int, H: int, WC: int, C: int, levels: int, y_align: int,
    construction: str = "mxu",
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

    ``construction`` "mxu" builds the tri planes via the rank-1 U
    scheme (see _warp_kernel): V from an in-kernel (window, 8) LHS
    (sy is face-dependent) against the constant lane-index RHS; Hx from
    the constant ``uwlhs`` (sx = lane//C baked in host-side — no per-face
    iota/div/mod passes) against a tiny face-dependent RHS, masked by the
    constant channel-phase plane. "legacy" keeps the per-face
    iota + div/mod construction.
    """
    b = pl.program_id(0)
    r = rfp_ref[b].astype(jnp.float32) * (1.0 / 65536.0)
    offy = offy_ref[b].astype(jnp.float32)
    x0 = x0_ref[b].astype(jnp.float32)
    WcC = window * C
    if construction == "legacy":
        out_ref, strip_ref, sem, t1_ref = rest
    else:
        (tlane_ref, uwlhs_ref, jxrow_ref, mask_ref,
         out_ref, strip_ref, sem, t1_ref) = rest
    dt = out_ref.dtype

    # Per-level body: DMA + vertical contraction only. The horizontal tap
    # build and final matmul are LEVEL-INVARIANT (they depend on x0 and r,
    # not the bucket), so they run once after the unrolled branches with
    # t1 carried in scratch — the Mosaic scoped-VMEM stack does not reuse
    # slots across unrolled bodies, and replicating the largest (WC, WcC)
    # chain per level tripled stack pressure for nothing.
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

            if construction == "legacy":
                o_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 0)
                t_i = jax.lax.broadcasted_iota(jnp.int32, (window, rows), 1)
                sy = offy + (o_i.astype(jnp.float32) + 0.5) * r - 0.5
                V = jnp.maximum(
                    0.0, 1.0 - jnp.abs(sy - t_i.astype(jnp.float32))
                ).astype(dt)
            else:
                # sy is face-dependent → build the (window, 8) U LHS from
                # a (window, 1) sublane iota (tiny), shared RHS [[t], [1]].
                # Mosaic only lowers INTEGER iota ("'tpu.iota' op result #0
                # must be vector of integer or index values" — round-4
                # on-chip sweep); build int32 and convert. Rank-1 form:
                # U = t − sy + 1 alone; tri = max(0, 1−|U−1|)
                # (_tri_from_u) — the W block (= 2−U) would double the
                # matmul-output stack tensor.
                o_col = jax.lax.broadcasted_iota(
                    jnp.int32, (window, 1), 0
                ).astype(jnp.float32)
                sy = offy + (o_col + 0.5) * r - 0.5
                ones_c = jnp.ones((window, 1), jnp.float32)
                zeros_c = jnp.zeros((window, 6), jnp.float32)
                lhs = jnp.concatenate(
                    [ones_c, 1.0 - sy, zeros_c], axis=1
                )  # (window, 8), K padded to the f32 sublane tile
                U = jax.lax.dot_general(
                    lhs, tlane_ref[:, :rows],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                V = _tri_from_u(U, 1.0).astype(dt)
            t1_ref[...] = jax.lax.dot_general(
                V, strip_ref[:rows],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # (window, WC)

    t1 = t1_ref[...]
    if construction == "legacy":
        s_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 0)
        j_i = jax.lax.broadcasted_iota(jnp.int32, (WC, WcC), 1)
        sx = s_i // C
        sc = s_i - sx * C
        jx = j_i // C
        jc = j_i - jx * C
        sxj = x0 + (jx.astype(jnp.float32) + 0.5) * r - 0.5
        Hx = jnp.where(
            sc == jc,
            jnp.maximum(
                0.0, 1.0 - jnp.abs(sxj - sx.astype(jnp.float32))
            ),
            0.0,
        ).astype(dt)
    else:
        # Rank-1: U = 1 − sxj + sx from constant LHS rows [+1, 1−sx]
        # (uwlhs) and the face-dependent RHS [[sxj], [1]] built from the
        # constant jx row; tri = max(0, 1−|U−1|) (_tri_from_u). This
        # halved the kernel's largest stack tensor — the 2-block [U; W]
        # form OOMed the 16 MB scoped-VMEM limit by 4.15 MB (round-4
        # on-chip sweep, WC=1920).
        sxj = x0 + (jxrow_ref[...] + 0.5) * r - 0.5  # (1, WcC)
        rhs = jnp.concatenate(
            [sxj, jnp.ones((1, WcC), jnp.float32),
             jnp.zeros((6, WcC), jnp.float32)], axis=0
        )
        U = jax.lax.dot_general(
            uwlhs_ref[...], rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        Hx = (
            _tri_from_u(U, 1.0).astype(jnp.bfloat16) * mask_ref[...]
        ).astype(dt)
    out_ref[0] = jax.lax.dot_general(
        t1, Hx,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("window", "channels", "levels", "y_align",
                                   "construction"))
def crop_window_frac_pallas(
    frames_flat: jnp.ndarray, strip0: jnp.ndarray, level: jnp.ndarray,
    r: jnp.ndarray, off_y: jnp.ndarray, x0f: jnp.ndarray,
    window: int, channels: int, levels: int,
    y_align: int = 16, frame_idx: jnp.ndarray = None,
    construction: str = "mxu",
) -> jnp.ndarray:
    """Fractional-scale sibling of :func:`crop_window_pool_pallas`.

    frames_flat: (B, H, W·C) row-flattened frames; strip0/level/off_y/x0f/r
    from ``window_geometry_frac`` (strip0 selected per face, LEVEL-0 rows;
    off_y and x0f are integer-valued floats; r carries the 2⁻¹⁶-quantized
    resample factor). Returns (N, window, window·C) in the frame dtype.

    ``construction``: "mxu" (default) builds the tri tap planes via the
    rank-1 U scheme with host-precomputed index constants — no per-face
    iota/div/mod VPU passes; "legacy" keeps the original construction.
    """
    if construction not in ("legacy", "mxu"):
        raise ValueError(f"unknown crop construction {construction!r}")
    B, H, WC = frames_flat.shape
    WCp = -(-WC // 128) * 128
    if WCp != WC:
        frames_flat = jnp.pad(frames_flat, ((0, 0), (0, 0), (0, WCp - WC)))
        WC = WCp
    if frame_idx is None:
        frame_idx = jnp.arange(strip0.shape[0], dtype=jnp.int32)
    N = strip0.shape[0]
    C = channels
    WcC = window * C
    rows_top = min(window << (levels - 1), H)

    import numpy as np  # host-side constants

    # Constant planes for the mxu construction ONLY (the legacy path must
    # not pay their VMEM residency/DMA): lane-index RHS for V, the rank-1
    # U LHS with sx = lane//C baked in for Hx (_tri_uw_lhs), the
    # output-lane x index row, and the channel-phase mask.
    extra_ops, extra_specs = [], []
    if construction == "mxu":
        tl = np.zeros((8, rows_top), np.float32)
        tl[0] = np.arange(rows_top, dtype=np.float32)
        tl[1] = 1.0
        sxv = np.arange(WC, dtype=np.int64) // C
        uwlhs = _tri_uw_lhs(sxv, jnp.float32)
        jxrow = (np.arange(WcC, dtype=np.int64) // C).astype(np.float32)[None]
        mask = (
            (np.arange(WC, dtype=np.int64) % C)[:, None]
            == (np.arange(WcC, dtype=np.int64) % C)[None, :]
        )
        extra_ops = [
            jnp.asarray(tl), jnp.asarray(uwlhs), jnp.asarray(jxrow),
            jnp.asarray(mask, jnp.bfloat16),
        ]
        extra_specs = [
            pl.BlockSpec((8, rows_top),
                         lambda b, s0, lvl, fi, rfp, oy, x0: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WC, 8),
                         lambda b, s0, lvl, fi, rfp, oy, x0: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WcC),
                         lambda b, s0, lvl, fi, rfp, oy, x0: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WC, WcC),
                         lambda b, s0, lvl, fi, rfp, oy, x0: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), *extra_specs],
        out_specs=pl.BlockSpec(
            (1, window, WcC), lambda b, s0, lvl, fi, rfp, oy, x0: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_top, WC), frames_flat.dtype),
            pltpu.SemaphoreType.DMA,
            # t1 carries the vertical contraction out of the unrolled
            # level branches so the horizontal build runs once (see
            # _crop_frac_kernel).
            pltpu.VMEM((window, WC), frames_flat.dtype),
        ],
    )
    out = pl.pallas_call(
        partial(_crop_frac_kernel, window=window, H=H, WC=WC, C=channels,
                levels=levels, y_align=y_align, construction=construction),
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
               frames_flat, *extra_ops)
