"""Space-to-depth early-stage backbone (inference serving path).

The stem + stage-1/2 blocks run at 112² with 24-56 channels — stored
padded to 128 lanes on TPU, so the bandwidth-bound early stages
(BASELINE.md: ~3% MFU) waste most of their HBM traffic on lane padding,
and the stem's 3-channel contraction starves the MXU. This module
re-expresses stem + blocks 0-2 (the whole 112² portion of the b4
backbone) in a block-4 space-to-depth domain where every tensor lives at
56² with 4× the channels:

- the image becomes (56, 56, 48) and the stride-2 stem an exact k2 conv
  with a 192-wide contraction (full MXU tiles);
- stride-1 depthwise convs become grouped k3 convs over per-channel
  4-phase groups (channel-major layout c*4+phase);
- the stage-2 stride-2 depthwise collapses the phases back to a plain
  56² tensor, where the standard backbone resumes at ``start_block=3``.

Kernels are assembled from the trained stem/block params by an index map
derived from the exact XLA SAME-padding tap algebra (``_phase_taps``), BN
folded at build time — numerics match the plain backbone to bf16
tolerance (tests/test_s2d_early.py). Inference-only, composes with the
int8 late-stage tail (models/int8_tail.py).

Capability parity: the reference runs its backbone under cuDNN inference
kernels that space-to-depth/pad small-channel stages internally
(`/root/reference/src/feature_extraction/efficientnet.py:122-151`); this
is the TPU-native equivalent of that platform optimization.

MEASURED OUT on this platform (round 3, v5e behind the axon tunnel):
the s2d+int8 e2e serving graph runs 92.8 ms @ b256 vs 75.1 ms for the
plain int8 graph in the same process (49.2 vs 37.8 ms @ b128) — the
grouped 4-phase k3 convs (feature_group_count = C) lower to a SLOWER
schedule than the lane-padded-but-fused plain depthwise stages they
replace, same failure mode as the fused-stage kernel family
(ops/pallas/fused_stages.py): XLA's fused small-stage pipeline is hard
to beat here. Stays available behind ``FusedPipeline(use_s2d_early=True)``
with full parity tests; off by default.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.pallas.fused_mbconv import fold_bn
from .efficientnet import block_args

_DN = ("NHWC", "HWIO", "NHWC")


def _same_pad_low(h: int, k: int, s: int) -> int:
    """XLA 'SAME' low padding for size h, kernel k, stride s."""
    total = max((math.ceil(h / s) - 1) * s + k - h, 0)
    return total // 2


def _phase_taps(k: int, s: int, b_in: int, b_out: int, h: int
                ) -> Tuple[List[Tuple[int, int, int, int]], int, int]:
    """Tap algebra for one axis of a conv re-expressed on s2d blocks.

    A conv (kernel k, stride s, SAME) maps original input position
    ``s*O + dy - pad`` to output position O. With input on s2d blocks of
    ``b_in`` (position = b_in*i + p) and output on blocks of ``b_out``
    (position = b_out*o + q), and s*b_out == b_in, the tap at (q, dy)
    lands on s2d row ``i + ky`` phase ``p`` where ``m = s*q + dy - pad``,
    ``ky = m // b_in``, ``p = m % b_in``.

    Returns (taps, ky_min, ky_max) with taps = [(ky, p, q, dy)].
    """
    assert s * b_out == b_in, (s, b_out, b_in)
    pad = _same_pad_low(h, k, s)
    taps = []
    for q in range(b_out):
        for dy in range(k):
            m = s * q + dy - pad
            taps.append((m // b_in, m % b_in, q, dy))
    ky_min = min(t[0] for t in taps)
    ky_max = max(t[0] for t in taps)
    return taps, ky_min, ky_max


def _conv(x: jnp.ndarray, w: jnp.ndarray, pad: Tuple[Tuple[int, int], ...],
          groups: int = 1) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad, dimension_numbers=_DN,
        feature_group_count=groups,
    )


def _silu(x):
    return x * jax.nn.sigmoid(x)


class S2DEarlyRunner:
    """Runs stem + blocks 0-2 of an EfficientNet backbone in s2d-4 domain.

    __call__(norm_images (B, H, W, 3) bf16) -> (B, H/4, W/4, C_stage2)
    activation — the input of flat block 3 (feed the plain backbone with
    ``start_block=3``).
    """

    def __init__(self, variant: str, params: Dict[str, Any],
                 stats: Dict[str, Any], image_size: int = 224):
        self.variant = variant
        self.image_size = image_size
        blocks = block_args(variant)
        # This reformulation covers the 112² portion: stem (s2) + the
        # stage-1 s1 blocks + the first stage-2 block (s2), i.e. flat
        # blocks [0, first_stride2_after_0].
        self.n_s1_blocks = next(i for i, b in enumerate(blocks[1:], 1)
                                if b["stride"] == 2)
        self.resume_block = self.n_s1_blocks + 1
        h = image_size // 2  # original stem-output grid (112)
        self.h_out = image_size // 4

        f32 = lambda a: jnp.asarray(a, jnp.float32)

        # --- stem: k3 s2 on the image (b_in=4, b_out=2 per axis) ---
        w3, b3 = fold_bn(f32(params["stem_conv"]["kernel"]),
                         params["stem_bn"], stats["stem_bn"])
        cin, cout = w3.shape[2], w3.shape[3]
        # dense s2d kernel: input layout (py, px, c) phase-major, output
        # layout (c, qy, qx) channel-major — assembled in _build_stem.
        # All kernel assembly below is pure jnp (works on traced params
        # inside jit; XLA constant-folds it when params are concrete).
        taps, ky0, ky1 = _phase_taps(3, 2, 4, 2, image_size)
        self._build_stem(jnp.asarray(w3, jnp.float32),
                         jnp.asarray(b3, jnp.float32),
                         taps, ky0, ky1 - ky0 + 1, cin, cout)

        # --- stage-1 depthwise blocks (s1, expand_ratio 1) ---
        self.s1 = []
        for i in range(self.n_s1_blocks):
            self.s1.append(self._build_s1_block(params[f"block_{i}"],
                                                stats[f"block_{i}"], h))

        # --- stage-2 first block (expand, depthwise s2, SE, project) ---
        self.s2 = self._build_s2_block(params[f"block_{self.n_s1_blocks}"],
                                       stats[f"block_{self.n_s1_blocks}"], h)

    # -- builders ---------------------------------------------------------

    def _build_stem(self, w3: jnp.ndarray, bias: jnp.ndarray,
                    taps, ky0: int, ks: int, cin: int, cout: int) -> None:
        w2 = jnp.zeros((ks, ks, 16 * cin, cout * 4), jnp.float32)
        for (ky, py, qy, dy) in taps:
            for (kx, px, qx, dx) in taps:
                # input ch (py*4+px)*cin + c ; output ch c*4 + qy*2 + qx
                ci = (py * 4 + px) * cin
                co = qy * 2 + qx
                w2 = w2.at[ky - ky0, kx - ky0, ci:ci + cin,
                           co::4].add(w3[dy, dx, :, :])
        pad = (-ky0, ks - 1 + ky0)  # ky ranges [ky0, ky0+ks-1]
        self.stem_w = w2.astype(jnp.bfloat16)
        self.stem_b = jnp.repeat(bias.astype(jnp.float32), 4)
        self.stem_pad = (pad, pad)
        self.stem_cout = cout

    def _dw_phase_kernel(self, wdw: jnp.ndarray, h: int, stride: int,
                         b_out: int) -> Tuple[jnp.ndarray, Tuple]:
        """Depthwise k3 kernel (3,3,1,c) → grouped s2d kernel.

        Input layout c*4+(py*2+px), groups=C of 4 phases each; output
        c*b_out²+(qy*b_out+qx) (b_out=2 for s1, 1 for s2).
        """
        k = wdw.shape[0]
        C = wdw.shape[3]
        taps, ky0, ky1 = _phase_taps(k, stride, 2, b_out, h)
        ks = ky1 - ky0 + 1
        w = jnp.zeros((ks, ks, 4, C * b_out * b_out), jnp.float32)
        for (ky, py, qy, dy) in taps:
            for (kx, px, qx, dx) in taps:
                pi = py * 2 + px
                qo = qy * b_out + qx
                w = w.at[ky - ky0, kx - ky0, pi,
                         qo::b_out * b_out].add(wdw[dy, dx, 0, :])
        pad = (-ky0, ks - 1 + ky0)
        return w.astype(jnp.bfloat16), (pad, pad)

    def _build_s1_block(self, p: Dict, s: Dict, h: int) -> Dict:
        wdw, bdw = fold_bn(jnp.asarray(p["depthwise_conv"]["kernel"],
                                       jnp.float32), p["bn1"], s["bn1"])
        wk, pad = self._dw_phase_kernel(wdw, h, 1, 2)
        wpr, bpr = fold_bn(jnp.asarray(p["project_conv"]["kernel"],
                                       jnp.float32), p["bn2"], s["bn2"])
        return dict(
            dw_w=wk, dw_pad=pad,
            dw_b=jnp.repeat(bdw.astype(jnp.float32), 4),
            se_rw=jnp.asarray(p["se_reduce"]["kernel"][0, 0], jnp.float32),
            se_rb=jnp.asarray(p["se_reduce"]["bias"], jnp.float32),
            se_ew=jnp.asarray(p["se_expand"]["kernel"][0, 0], jnp.float32),
            se_eb=jnp.asarray(p["se_expand"]["bias"], jnp.float32),
            pr_w=jnp.asarray(wpr[0, 0], jnp.bfloat16),
            pr_b=jnp.asarray(bpr, jnp.float32),
            cin=wk.shape[3] // 4, cout=int(wpr.shape[3]),
        )

    def _build_s2_block(self, p: Dict, s: Dict, h: int) -> Dict:
        wex, bex = fold_bn(jnp.asarray(p["expand_conv"]["kernel"],
                                       jnp.float32), p["bn0"], s["bn0"])
        wdw, bdw = fold_bn(jnp.asarray(p["depthwise_conv"]["kernel"],
                                       jnp.float32), p["bn1"], s["bn1"])
        wk, pad = self._dw_phase_kernel(wdw, h, 2, 1)
        wpr, bpr = fold_bn(jnp.asarray(p["project_conv"]["kernel"],
                                       jnp.float32), p["bn2"], s["bn2"])
        return dict(
            ex_w=jnp.asarray(wex[0, 0], jnp.bfloat16),
            ex_b=jnp.asarray(bex, jnp.float32),
            dw_w=wk, dw_pad=pad,
            dw_b=jnp.asarray(bdw, jnp.float32),
            se_rw=jnp.asarray(p["se_reduce"]["kernel"][0, 0], jnp.float32),
            se_rb=jnp.asarray(p["se_reduce"]["bias"], jnp.float32),
            se_ew=jnp.asarray(p["se_expand"]["kernel"][0, 0], jnp.float32),
            se_eb=jnp.asarray(p["se_expand"]["bias"], jnp.float32),
            pr_w=jnp.asarray(wpr[0, 0], jnp.bfloat16),
            pr_b=jnp.asarray(bpr, jnp.float32),
        )

    # -- phase-layout helpers --------------------------------------------

    @staticmethod
    def _per_phase_matmul(x: jnp.ndarray, w: jnp.ndarray, b, n_phase: int
                          ) -> jnp.ndarray:
        """1×1 conv applied identically per phase on channel-major layout.

        x: (B, H, W, C*n_phase) with layout c*n_phase+p; w: (C, D).
        Returns (B, H, W, D*n_phase), layout d*n_phase+p.
        """
        B, H, W, CP = x.shape
        C = CP // n_phase
        xp = x.reshape(B, H, W, C, n_phase)
        y = jnp.einsum("bhwcp,cd->bhwdp", xp.astype(jnp.bfloat16),
                       w.astype(jnp.bfloat16))
        y = y + b[None, None, None, :, None]
        return y.reshape(B, H, W, -1)

    @staticmethod
    def _se(x: jnp.ndarray, blk: Dict, n_phase: int) -> jnp.ndarray:
        """Squeeze-excitation over (H, W, phases) on channel-major layout."""
        B, H, W, CP = x.shape
        C = CP // n_phase
        xp = x.reshape(B, H, W, C, n_phase).astype(jnp.float32)
        se = xp.mean(axis=(1, 2, 4))                     # (B, C)
        se = _silu(se @ blk["se_rw"] + blk["se_rb"])
        se = jax.nn.sigmoid(se @ blk["se_ew"] + blk["se_eb"])  # (B, C)
        se = jnp.repeat(se, n_phase, axis=1)             # c-major broadcast
        return (x * se[:, None, None, :].astype(x.dtype))

    # -- forward ----------------------------------------------------------

    def __call__(self, norm_images: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = norm_images.shape
        assert C == 3 and H == self.image_size
        h = H // 4
        # s2d-4: (B, H, W, 3) -> (B, h, 4, h, 4, 3) -> (B, h, h, (py,px,c))
        x = norm_images.reshape(B, h, 4, h, 4, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, h, h, 48)
        x = x.astype(jnp.bfloat16)

        # stem (dense k2 conv, 48 -> 4*stem_filters, c-major phases)
        x = _conv(x, self.stem_w, self.stem_pad)
        x = _silu(x + self.stem_b).astype(jnp.bfloat16)

        # stage-1 blocks: dw (grouped, 4-phase groups) + SE + project
        for blk in self.s1:
            inp = x
            y = _conv(x, blk["dw_w"], blk["dw_pad"], groups=blk["cin"])
            y = _silu(y + blk["dw_b"]).astype(jnp.bfloat16)
            y = self._se(y, blk, 4)
            y = self._per_phase_matmul(y, blk["pr_w"], blk["pr_b"], 4)
            y = y.astype(jnp.bfloat16)
            if y.shape == inp.shape:
                y = y + inp
            x = y

        # stage-2 first block: expand, dw s2 (collapses phases), SE, project
        blk = self.s2
        x = self._per_phase_matmul(x, blk["ex_w"], blk["ex_b"], 4)
        x = _silu(x).astype(jnp.bfloat16)
        E = x.shape[3] // 4
        x = _conv(x, blk["dw_w"], blk["dw_pad"], groups=E)   # (B, h, h, E)
        x = _silu(x + blk["dw_b"]).astype(jnp.bfloat16)
        # plain-tensor SE + project
        se = x.astype(jnp.float32).mean(axis=(1, 2))
        se = _silu(se @ blk["se_rw"] + blk["se_rb"])
        se = jax.nn.sigmoid(se @ blk["se_ew"] + blk["se_eb"])
        x = x * se[:, None, None, :].astype(x.dtype)
        x = jnp.einsum("bhwc,cd->bhwd", x, blk["pr_w"]) + blk["pr_b"]
        return x.astype(jnp.bfloat16)
