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


def _warp_kernel(coef_ref, imgT_ref, out_ref, *, R: int, Ho: int, Wo: int,
                 Hs: int, Ws: int, C: int):
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

    # Vertical taps: V_T (Hs, n); tri-weight ⇒ BORDER_CONSTANT=0.
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (Hs, n), 0).astype(jnp.float32)
    V = jnp.maximum(0.0, 1.0 - jnp.abs(sy - t_iota)).astype(jnp.bfloat16)

    # Horizontal taps: H_T (Ws, n), bf16 to halve VPU/VMEM traffic of the
    # elementwise pass (≤1/255 extra error on uint8-range pixels).
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (Ws, n), 0).astype(jnp.float32)
    H = jnp.maximum(0.0, 1.0 - jnp.abs(sx - s_iota)).astype(jnp.bfloat16)

    for ch in range(C):
        imgT = imgT_ref[0, ch]  # (Ws, Hs) bf16, x-major
        P = jax.lax.dot_general(
            imgT, V,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (Ws, n)
        out_ref[0, 0, ch, :] = jnp.sum((P * H).astype(jnp.float32), axis=0)


@partial(jax.jit, static_argnames=("out_size", "inverse", "row_chunk"))
def warp_affine_pallas(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    inverse: bool = False,
    row_chunk: int = 16,
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
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, Ws, Hs), lambda bi, ki: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_chunks * C * Ws * Hs * R * Wo,
            bytes_accessed=B * C * Ws * Hs * 2 + B * C * Ho * Wo * 4,
            transcendentals=0,
        ),
        **common,
    )(coeffs, imgT)

    # (B, n_chunks, C, R·Wo) → (B, Ho, Wo, C)
    out = out.reshape(B, n_chunks, C, R, Wo)
    return jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(B, Ho, Wo, C)


# ---------------------------------------------------------------------------
# Windowed crop: per-image dynamic offsets without gathers
# ---------------------------------------------------------------------------


def _crop_kernel(y8_ref, x0c_ref, img_ref, out_ref, *, WcC: int):
    del y8_ref  # consumed by the index_map only
    b = pl.program_id(0)
    strip = img_ref[0]  # (ROWS, Ws·C) — rows already offset via index_map
    rolled = pltpu.roll(strip, -x0c_ref[b], axis=1)
    out_ref[0] = rolled[:, :WcC]


@partial(jax.jit, static_argnames=("window",))
def crop_window_pallas(
    images: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray, window: int
) -> jnp.ndarray:
    """Extract per-image (window, window) crops at dynamic offsets.

    TPU has no fast gather; this kernel gets dynamic offsets for free
    instead: the ROW offset selects which 8-row HBM blocks are DMA'd into
    VMEM (scalar-prefetch index_map — y0 must be a multiple of 8), and the
    COLUMN offset is a lane rotation of each strip (arbitrary alignment).
    Only the window's rows ever leave HBM.

    images: (B, H, W, C) float32; y0/x0: (B,) int32 top-left corners,
    0 ≤ y0 ≤ H−window (×8), 0 ≤ x0 ≤ W−window. Returns (B, window, window, C).
    """
    B, H, W, C = images.shape
    ROWS = 8
    WsC, WcC = W * C, window * C
    # tpu.dynamic_rotate needs a lane-aligned operand: pad W·C up to a
    # multiple of 128. The pad is junk-safe — max lane read is
    # WcC−1 + max(x0)·C = W·C − 1, never into the padding.
    WsC_pad = -(-WsC // 128) * 128
    y8 = (y0 // ROWS).astype(jnp.int32)
    x0c = (x0 * C).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, window // ROWS),
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, WsC_pad), lambda b, r, y8, x0c: (b, y8[b] + r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS, WcC), lambda b, r, y8, x0c: (b, r, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        partial(_crop_kernel, WcC=WcC),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, window, WcC), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=B * window * (WsC_pad + WcC) * 4,
            transcendentals=0,
        ),
    )
    flat = images.reshape(B, H, WsC).astype(jnp.float32)
    if WsC_pad != WsC:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, WsC_pad - WsC)))
    return out(y8, x0c, flat).reshape(B, window, window, C)
