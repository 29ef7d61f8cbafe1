"""Pallas TPU kernel: fused MBConv block (inference).

Why: the B4 stage-truncation profile (BASELINE.md) shows the early blocks
(112²/56² spatial, ≤32 channels) run at ~3% MFU — bandwidth-bound on the
expanded activations XLA writes to HBM between the expand / depthwise / SE /
project ops. This kernel keeps the whole chain in VMEM: per grid cell (one
image), HBM sees only the block input once and the block output once.

Layout (the part that matters): everything is **lane-major over pixels** —
activations live as (C, H·W) so the channel dim (24–192 in the hot blocks)
sits on sublanes with no padding, and the 12544/3136 pixel dim fills lanes
exactly. The channel-major variant padded 24 channels to 128 lanes and
blew VMEM 5× (57 MB scoped alloc). Depthwise taps become lane rolls
(`pltpu.roll`) with iota masks for image-edge wrap.

Scope (prototype, stride-1 k=3 blocks): expand 1×1 (matmul, K=Cin) → silu →
depthwise 3×3 as 9 rolled accumulations → silu → squeeze-excite (lane-mean
+ two tiny matmuls + scale) → project 1×1 → residual. BatchNorms folded by
``fold_bn`` (inference only — training keeps the XLA path).

Numerics: bf16 storage, fp32 rolls (Mosaic has no bf16 rotate), fp32
matmul + depthwise accumulation.

MEASURED RESULT (v5e, batch 64, vs the XLA MBConvBlock in isolation):
block1@112² 3.47 vs 3.63 ms (≈parity), block3@56² 4.41 vs 2.98 ms,
block12@14² 3.65 vs 2.36 ms — the 9 full-image f32 lane rotations per
channel group cost more than the HBM round-trips they save, and isolated
XLA blocks understate the fused-across-blocks network. Kept as validated
infrastructure (BN folding, lane-major activation patterns, group
streaming); NOT wired into the backbone. The round-2 direction is a
multi-block fusion where the rotation cost amortizes across the chain, or
halo-exchange row blocks instead of rotations.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel: jnp.ndarray, bn_params: Dict, bn_stats: Dict, eps: float = 1e-3):
    """Fold BatchNorm(scale,bias,mean,var) into a conv kernel + bias.

    kernel: (..., Cout) — any conv layout with output channels last.
    Returns (scaled_kernel, bias).
    """
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return kernel * scale, bias


_GROUP = 48  # expanded channels processed per VMEM-resident group


def _mbconv_kernel(x_ref, w_exp_ref, b_exp_ref, w_dw_ref, b_dw_ref,
                   w_se1_ref, b_se1_ref, w_se2_ref, b_se2_ref,
                   w_proj_ref, b_proj_ref, out_ref, d_scratch, *,
                   H: int, W: int, Cin: int, Cexp: int, Cout: int,
                   has_expand: bool, residual: bool):
    """Channel-group streaming keeps VMEM bounded at large spatial sizes:
    the expanded activations are produced, depthwise-convolved (9 lane
    rotations, f32 — Mosaic has no bf16 rotate), and parked in a bf16
    scratch group by group; SE then reads per-channel means, and the
    projection accumulates group matmuls."""
    n = H * W
    x = x_ref[0]  # (Cin, n) bf16, lane-major pixels

    p_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col = p_iota % W

    groups = [(g, min(_GROUP, Cexp - g)) for g in range(0, Cexp, _GROUP)]

    # Phase A: expand → depthwise → silu per channel group, parked in scratch.
    for g0, gs in groups:
        if has_expand:
            e_g = jax.lax.dot_general(
                w_exp_ref[g0:g0 + gs, :], x,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_exp_ref[0, g0:g0 + gs].reshape(gs, 1)
            e_g = jax.nn.silu(e_g)  # (gs, n) f32
        else:
            e_g = x[g0:g0 + gs, :].astype(jnp.float32)

        acc = jnp.zeros((gs, n), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                off = dy * W + dx
                tap = w_dw_ref[dy + 1, dx + 1, g0:g0 + gs].reshape(gs, 1)
                shifted = pltpu.roll(e_g, (-off) % n, axis=1) if off != 0 else e_g
                valid = jnp.ones((1, n), jnp.float32)
                if dx == 1:
                    valid = valid * (col != W - 1)
                elif dx == -1:
                    valid = valid * (col != 0)
                if dy == 1:
                    valid = valid * (p_iota < (H - 1) * W)
                elif dy == -1:
                    valid = valid * (p_iota >= W)
                acc = acc + shifted * (tap * valid)
        d_scratch[g0:g0 + gs, :] = jax.nn.silu(
            acc + b_dw_ref[0, g0:g0 + gs].reshape(gs, 1)
        ).astype(jnp.bfloat16)

    # Phase B: squeeze-excite scale from per-channel means of d.
    d_mean = jnp.mean(d_scratch[:].astype(jnp.float32), axis=1, keepdims=True)
    se = jax.nn.silu(
        jax.lax.dot_general(
            w_se1_ref[:], d_mean,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_se1_ref[:].reshape(-1, 1)
    )
    se = jax.nn.sigmoid(
        jax.lax.dot_general(
            w_se2_ref[:], se,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_se2_ref[:].reshape(Cexp, 1)
    )  # (Cexp, 1)

    # Phase C: projection accumulated over channel groups.
    out = jnp.zeros((Cout, n), jnp.float32)
    for g0, gs in groups:
        d_g = (d_scratch[g0:g0 + gs, :].astype(jnp.float32)
               * se[g0:g0 + gs]).astype(jnp.bfloat16)
        out = out + jax.lax.dot_general(
            w_proj_ref[:, g0:g0 + gs], d_g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = out + b_proj_ref[:].reshape(Cout, 1)
    if residual:
        out = out + x.astype(jnp.float32)
    out_ref[0] = out.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("H", "W", "expand_ratio"))
def fused_mbconv(
    x: jnp.ndarray,
    folded: Dict[str, jnp.ndarray],
    H: int,
    W: int,
    expand_ratio: int,
) -> jnp.ndarray:
    """Run one stride-1 k=3 MBConv block fused in VMEM.

    x: (B, H, W, Cin) bf16/f32. ``folded``: BN-folded weights from
    :func:`fold_mbconv_params` — w_exp (Cexp,Cin) [transposed for the
    lane-major matmul], b_exp (Cexp), w_dw (3,3,Cexp), b_dw (Cexp),
    w_se1 (Cse,Cexp), b_se1 (Cse), w_se2 (Cexp,Cse), b_se2 (Cexp),
    w_proj (Cout,Cexp), b_proj (Cout).
    Returns (B, H, W, Cout) bf16.
    """
    B = x.shape[0]
    Cin = x.shape[-1]
    Cexp = folded["w_dw"].shape[-1]
    Cout = folded["w_proj"].shape[0]
    has_expand = expand_ratio != 1
    residual = Cin == Cout

    # NHWC → (B, C, H·W): lane-major pixels.
    xf = jnp.transpose(x.reshape(B, H * W, Cin), (0, 2, 1)).astype(jnp.bfloat16)

    def vec(name):
        return folded[name].astype(jnp.float32).reshape(1, -1)

    args = [
        xf,
        folded["w_exp"].astype(jnp.bfloat16),
        vec("b_exp"),
        folded["w_dw"].astype(jnp.float32),
        vec("b_dw"),
        folded["w_se1"].astype(jnp.float32),
        vec("b_se1"),
        folded["w_se2"].astype(jnp.float32),
        vec("b_se2"),
        folded["w_proj"].astype(jnp.bfloat16),
        vec("b_proj"),
    ]
    kernel = partial(
        _mbconv_kernel, H=H, W=W, Cin=Cin, Cexp=Cexp, Cout=Cout,
        has_expand=has_expand, residual=residual,
    )

    def full(a):
        shape = a.shape
        return pl.BlockSpec(shape, lambda b, _s=shape: tuple(0 for _ in _s),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Cin, H * W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in args[1:]],
        out_specs=pl.BlockSpec((1, Cout, H * W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H * W), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Cexp, H * W), jnp.bfloat16)],
    )(*args)
    return jnp.transpose(out, (0, 2, 1)).reshape(B, H, W, Cout)


def fold_mbconv_params(params: Dict, stats: Dict, expand_ratio: int) -> Dict[str, jnp.ndarray]:
    """Fold a flax MBConvBlock's params/batch_stats into fused-kernel weights
    (lane-major layout: all 1×1 kernels transposed to (Cout, Cin))."""
    out: Dict[str, jnp.ndarray] = {}
    if expand_ratio != 1:
        k, b = fold_bn(params["expand_conv"]["kernel"][0, 0], params["bn0"], stats["bn0"])
        out["w_exp"], out["b_exp"] = k.T, b  # (Cexp, Cin)
    else:
        cin = params["depthwise_conv"]["kernel"].shape[-1]
        out["w_exp"] = jnp.eye(cin)
        out["b_exp"] = jnp.zeros((cin,))
    kdw, bdw = fold_bn(params["depthwise_conv"]["kernel"][:, :, 0, :], params["bn1"], stats["bn1"])
    out["w_dw"], out["b_dw"] = kdw, bdw  # (3, 3, Cexp)
    out["w_se1"] = params["se_reduce"]["kernel"][0, 0].T  # (Cse, Cexp)
    out["b_se1"] = params["se_reduce"]["bias"]
    out["w_se2"] = params["se_expand"]["kernel"][0, 0].T  # (Cexp, Cse)
    out["b_se2"] = params["se_expand"]["bias"]
    kp, bp = fold_bn(params["project_conv"]["kernel"][0, 0], params["bn2"], stats["bn2"])
    out["w_proj"], out["b_proj"] = kp.T, bp  # (Cout, Cexp)
    return out
