"""Pallas TPU kernels: MBConv blocks fused in VMEM (inference).

Round-1 profiling (BASELINE.md): the B4 early stages run at ~3% MFU —
bandwidth-bound on the expanded activations XLA materializes in HBM between
expand / depthwise / SE / project. The round-1 single-block prototype
(``fused_mbconv.py``) kept a block in VMEM but spent its savings on 9
full-image lane rotations per channel group (flattened (C, H·W) layout) and
measured parity at best.

This kernel family keeps each whole MBConv block's expanded activations out
of HBM with three structural ideas:

- **(C, H, 128) activation layout** — W sits alone on the 128-lane axis
  (zero-padded W→128), H on sublanes. A depthwise k×k then needs only
  ``k−1`` lane rolls *per channel group* (the ±dx variants, shared across
  all dy) instead of k²−1 full-image rotations: the dy taps are **static
  sublane-offset slices** of a halo-padded scratch. Because padded lanes
  are kept zero, rolled-in wrap values are zeros — no dx edge masks at all.
- **Space-to-depth phase entry for stride 2** — a stride-2 depthwise tap
  at input coord ``2y+iy`` reads phase plane ``iy mod 2`` at row
  ``y + ⌊iy/2⌋``: with inputs pre-split (one cheap XLA pass) into the four
  (py, px) phase planes, a stride-2 conv becomes the same static-slice +
  lane-roll pattern as stride 1. The 3×3-s2 **stem** is the degenerate
  case: its 27 shifted phase planes are pre-stacked into an im2col slab so
  the whole stem is ONE matmul.
- **Group loop in the GRID, not the kernel body** — Mosaic's scoped-VMEM
  stack allocator does not reuse slots across unrolled loop iterations
  (measured: an unrolled 5-group stride-2 block wanted a 36.8 MB stack vs
  the 16 MB v5e limit). Each block therefore runs as ``grid (B, 2·G)``:
  cells 0..G−1 stream one 32-channel group each through
  expand → depthwise → SE-partial (parking the dw output in a bf16
  scratch), cells G..2G−1 finish squeeze-excite and accumulate the
  projection group by group. All cross-cell state lives in scratch; per-
  cell weight slices arrive via BlockSpec index maps (no dynamic in-kernel
  weight slicing). HBM sees a block's input once and its output once — the
  expanded tensors never leave VMEM.

Matmuls (expand / project / SE / stem) take bf16 operands with fp32
accumulation on the MXU; depthwise taps accumulate in fp32 on the VPU.
BatchNorms are folded (inference path only — training stays on XLA).

MEASURED STATUS (v5e behind the axon tunnel, b64 @224, round 2): the
kernels are numerically exact vs the flax blocks (tests/test_fused_stages)
and compile+run on hardware — stem+blocks 0-1 5.96 ms, blocks 2-5 22.8 ms,
blocks 6-9 42.5 ms, blocks 10-21 122 ms vs 12.5 ms for the ENTIRE XLA
backbone. The loss decomposes into platform overheads this design cannot
amortize: ~1-4 µs per grid cell (thousands of (image, group) cells) plus a
per-dispatch floor on the tunnel, on top of VPU-bound tap arithmetic that
XLA's conv schedule executes better. Four design iterations are recorded
in git history (whole-stage bodies → VMEM-stack OOM; smaller kernels →
still OOM on stride-2; bf16 scratch + single-live-variant rolls →
compiles; grid-over-groups → correct but overhead-bound). The path stays
available behind ``use_fused_backbone`` / ``FusedBackboneRunner`` for
hardware where pallas_call overheads are native-grade, and the layout +
space-to-depth machinery is reused by future kernel work; the production
classify path stays on XLA.

Reference counterpart: the cuDNN kernels behind
``/root/reference/src/feature_extraction/efficientnet.py:122-151``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mbconv import fold_bn

LANES = 128
DEFAULT_GROUP = 32  # expanded channels per grid cell (cexp padded to a multiple)


def group_for(h: int, kernel: int = 3, stride: int = 1) -> int:
    """Per-cell channel-group size: 16 at large spatial extents and for
    5×5 stride-2 blocks (4 phase slabs × 25 taps) — the scoped-VMEM stack
    scales as group × h·128 and both cases measured just past the 16 MB
    limit at group 32 (656 KB / 470 KB over)."""
    if h >= 100 or (kernel == 5 and stride == 2):
        return 16
    return DEFAULT_GROUP


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    """Static description of one MBConv block."""

    kernel: int            # 3 or 5
    stride: int            # 1 or 2
    cin: int
    cexp: int
    cse: int
    cout: int
    has_expand: bool
    residual: bool
    group: int = DEFAULT_GROUP

    @property
    def n_groups(self) -> int:
        return -(-self.cexp // self.group)

    @property
    def cexp_pad(self) -> int:
        return self.n_groups * self.group


@dataclasses.dataclass(frozen=True)
class StagePlan:
    """A group of blocks executed back to back at one output resolution
    (each block is its own pallas_call; the plan organizes weights and the
    XLA-side space-to-depth preps between resolutions)."""

    blocks: Tuple[BlockPlan, ...]
    h_in: int
    stem: bool = False     # entry is the 3×3-s2 stem matmul kernel
    c_stem: int = 0

    @property
    def downsamples(self) -> bool:
        return self.stem or (self.blocks and self.blocks[0].stride == 2)

    @property
    def h_out(self) -> int:
        return self.h_in // 2 if self.downsamples else self.h_in


def _col_mask(w_valid: int, n: int):
    """(1, n) mask over flattened (h, 128) pixels: lane index < w_valid."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % LANES
    return (col < w_valid).astype(jnp.float32)


def _matmul(a, b):
    """bf16×bf16 → fp32 MXU matmul (contract a's dim 1 with b's dim 0)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _matmul_f32(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dw_s1(e_ref, k: int, off: int, h: int, taps, group: int):
    """Stride-1 depthwise over slab 0 of e_ref ((slabs, GROUP, rows, 128)
    bf16, zero halo rows around [off, off+h)). Lane rolls only for dx ≠ 0
    with exactly ONE fp32 rolled variant live at a time; dy taps are static
    sublane-offset slices. taps: (k·k, GROUP) fp32. Returns (GROUP, h·128)
    fp32 — 2-D because Mosaic supports the (GROUP,) → (GROUP, 1) tap
    reshape but not (GROUP, 1, 1), and (·, h, 128) ↔ (·, h·128) reshapes
    are free with the lane dim exactly 128."""
    pad = k // 2
    acc = jnp.zeros((group, h * LANES), jnp.float32)
    for dx in range(-pad, pad + 1):
        base = e_ref[0]                            # (group, rows, 128) bf16
        if dx > 0:
            # reads x+dx; circular roll — padded lanes are zero so wraps are zero
            var = pltpu.roll(base.astype(jnp.float32), (-dx) % LANES, axis=2)
        elif dx < 0:
            var = pltpu.roll(base.astype(jnp.float32), -dx, axis=2)
        else:
            var = base                             # bf16; FMA upcasts
        for dy in range(-pad, pad + 1):
            tap = taps[(dy + pad) * k + (dx + pad)].reshape(group, 1)
            sl = var[:, off + dy : off + dy + h, :]
            acc = acc + sl.reshape(group, h * LANES) * tap
    return acc


def _dw_s2(e_ref, k: int, h_out: int, taps, group: int):
    """Stride-2 depthwise over the 4 phase slabs of e_ref (bf16, data rows
    [1, 1+h_out), zero halo row above and below). One rolled variant live
    at a time. TF-SAME on even input: pad_before = (k−2)//2, so tap
    (dy, dx) reads input coord (2y + dy − pad_before); iy = dy − pad_before
    maps to phase iy mod 2 at row y + floor(iy/2)."""
    pad_before = (k - 2) // 2

    by_variant: Dict[Tuple[int, int, int], list] = {}
    for dy in range(k):
        iy = dy - pad_before
        py, sy = iy % 2, iy // 2  # floor division: iy=−1 → (1, −1)
        for dx in range(k):
            ix = dx - pad_before
            px, sx = ix % 2, ix // 2
            by_variant.setdefault((py, px, sx), []).append((dy, dx, sy))

    acc = jnp.zeros((group, h_out * LANES), jnp.float32)
    for (py, px, sx), tap_list in sorted(by_variant.items()):
        base = e_ref[py * 2 + px]
        if sx:
            var = pltpu.roll(base.astype(jnp.float32), (-sx) % LANES, axis=2)
        else:
            var = base
        for dy, dx, sy in tap_list:
            tap = taps[dy * k + dx].reshape(group, 1)
            sl = var[:, 1 + sy : 1 + sy + h_out, :]
            acc = acc + sl.reshape(group, h_out * LANES) * tap
    return acc


# ---------------------------------------------------------------------------
# Per-block kernel: grid (B, 2·G)
# ---------------------------------------------------------------------------


def _make_block_kernel(bp: BlockPlan, h: int):
    n = h * LANES
    k = bp.kernel
    off = 1 if bp.stride == 2 else k // 2
    G = bp.n_groups
    group = bp.group
    slabs = 4 if bp.stride == 2 else 1

    def kernel(x_ref, w_exp_ref, b_exp_ref, taps_ref, b_dw_ref,
               w_se1_ref, b_se1_ref, w_se2_ref, b_se2_ref,
               w_proj_ref, b_proj_ref, out_ref,
               e_ref, d_ref, se1_ref, se_ref, acc_ref):
        gi = pl.program_id(1)
        cmask = _col_mask(h, n)

        @pl.when(gi == 0)
        def _init():
            rows = e_ref.shape[2]
            for s in range(slabs):
                if off > 0:
                    e_ref[s, :, :off, :] = jnp.zeros((group, off, LANES), e_ref.dtype)
                if rows - (off + h) > 0:
                    e_ref[s, :, off + h :, :] = jnp.zeros(
                        (group, rows - off - h, LANES), e_ref.dtype
                    )
            se1_ref[...] = jnp.zeros(se1_ref.shape, jnp.float32)

        @pl.when(gi < G)
        def _phase1():
            # expand one group → depthwise → park + SE partial
            for p in range(slabs):
                if bp.stride == 2:
                    xp = x_ref[0, p, :, :h, :].reshape(bp.cin, n)
                else:
                    xp = x_ref[0, :, :h, :].reshape(bp.cin, n)
                e = _matmul(w_exp_ref[0], xp) + b_exp_ref[0, 0].reshape(group, 1)
                if bp.has_expand:
                    e = jax.nn.silu(e)
                e_ref[p, :, off : off + h, :] = (
                    (e * cmask).astype(jnp.bfloat16).reshape(group, h, LANES)
                )
            if bp.stride == 2:
                acc = _dw_s2(e_ref, k, h, taps_ref[0], group)
            else:
                acc = _dw_s1(e_ref, k, off, h, taps_ref[0], group)
            d = jax.nn.silu(acc + b_dw_ref[0, 0].reshape(group, 1)) * cmask
            # leading-index store — dynamic SUBLANE offsets measured ~17×
            # slower on this platform (CLAUDE.md), leading dims are free
            d_ref[gi] = d.astype(jnp.bfloat16)
            d_mean = jnp.sum(d, axis=1, keepdims=True) / float(h * h)
            se1_ref[...] = se1_ref[...] + _matmul_f32(w_se1_ref[0], d_mean)

        @pl.when(gi >= G)
        def _phase2():
            gc = gi - G

            @pl.when(gc == 0)
            def _finish_se():
                se1 = jax.nn.silu(se1_ref[...] + b_se1_ref[0].reshape(-1, 1))
                se = jax.nn.sigmoid(
                    _matmul_f32(w_se2_ref[...], se1)
                    + b_se2_ref[0].reshape(bp.cexp_pad, 1)
                )
                se_ref[...] = se.reshape(G, group, 1)
                acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

            d_g = d_ref[gc].astype(jnp.float32) * se_ref[gc]
            acc_ref[...] = acc_ref[...] + _matmul(w_proj_ref[0], d_g)

            @pl.when(gc == G - 1)
            def _write_out():
                out = acc_ref[...] + b_proj_ref[0].reshape(bp.cout, 1)
                if bp.residual:
                    out = out + x_ref[0, :, :h, :].reshape(bp.cin, n).astype(
                        jnp.float32
                    )
                out_ref[0] = (out * cmask).astype(jnp.bfloat16).reshape(
                    bp.cout, h, LANES
                )

    return kernel


def run_block(bp: BlockPlan, h: int, x: jnp.ndarray,
              weights: Sequence[jnp.ndarray], interpret: bool = False) -> jnp.ndarray:
    """One MBConv block.

    x: stride-1 → (B, cin, h, 128) bf16 lane-padded;
       stride-2 → (B, 4, cin, h+8, 128) phase planes (space_to_depth_phases).
    Returns (B, cout, h, 128) bf16."""
    B = x.shape[0]
    G = bp.n_groups
    group = bp.group
    rows = h + 2 * (1 if bp.stride == 2 else bp.kernel // 2)
    slabs = 4 if bp.stride == 2 else 1
    n = h * LANES

    def gclamp(nd):
        # phase-1 weight blocks: reuse the last group's block in phase 2
        return lambda b, gi, _n=nd: (jnp.minimum(gi, G - 1),) + (0,) * (_n - 1)

    def pclamp(nd):
        # phase-2 (projection) blocks: clamp into [0, G)
        return lambda b, gi, _n=nd: (jnp.clip(gi - G, 0, G - 1),) + (0,) * (_n - 1)

    def bfull(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, gi, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    if bp.stride == 2:
        x_spec = pl.BlockSpec((1, 4, bp.cin, x.shape[3], LANES),
                              lambda b, gi: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((1, bp.cin, h, LANES),
                              lambda b, gi: (b, 0, 0, 0), memory_space=pltpu.VMEM)

    w_exp, b_exp, taps, b_dw, w_se1, b_se1, w_se2, b_se2, w_proj, b_proj = weights
    in_specs = [
        x_spec,
        pl.BlockSpec((1, group, bp.cin), gclamp(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, group), gclamp(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bp.kernel ** 2, group), gclamp(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, group), gclamp(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bp.cse, group), gclamp(3), memory_space=pltpu.VMEM),
        bfull(b_se1.shape),
        bfull(w_se2.shape),
        bfull(b_se2.shape),
        pl.BlockSpec((1, bp.cout, group), pclamp(3), memory_space=pltpu.VMEM),
        bfull(b_proj.shape),
    ]

    out = pl.pallas_call(
        _make_block_kernel(bp, h),
        grid=(B, 2 * G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bp.cout, h, LANES),
                               lambda b, gi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, bp.cout, h, LANES), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((slabs, group, rows, LANES), jnp.bfloat16),   # e (halo)
            pltpu.VMEM((G, group, n), jnp.bfloat16),                 # d park
            pltpu.VMEM((bp.cse, 1), jnp.float32),                    # se1 sum
            pltpu.VMEM((G, group, 1), jnp.float32),                  # se scale
            pltpu.VMEM((bp.cout, n), jnp.float32),                   # proj acc
        ],
        interpret=interpret,
    )(x, w_exp, b_exp, taps, b_dw, w_se1, b_se1, w_se2, b_se2, w_proj, b_proj)
    return out


# ---------------------------------------------------------------------------
# Stem kernel: one matmul over the im2col phase stack, grid (B,)
# ---------------------------------------------------------------------------


def _stem_kernel(c_stem: int, h: int):
    n = h * LANES

    def kernel(x_ref, w_ref, b_ref, out_ref):
        cmask = _col_mask(h, n)
        x2 = x_ref[0, :, :h, :].reshape(27, n)
        y = jax.nn.silu(_matmul(w_ref[...], x2) + b_ref[0].reshape(-1, 1))
        out_ref[0] = (y * cmask).astype(jnp.bfloat16).reshape(c_stem, h, LANES)

    return kernel


def run_stem(c_stem: int, h: int, x: jnp.ndarray,
             weights: Sequence[jnp.ndarray], interpret: bool = False) -> jnp.ndarray:
    """x: (B, 27, h+8, 128) im2col stack (space_to_depth_stem)."""
    B = x.shape[0]
    w, b = weights

    def bfull(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bb, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _stem_kernel(c_stem, h),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 27, x.shape[2], LANES), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            bfull(w.shape),
            bfull(b.shape),
        ],
        out_specs=pl.BlockSpec((1, c_stem, h, LANES), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_stem, h, LANES), jnp.bfloat16),
        interpret=interpret,
    )(x, w, b)


def run_stage(plan: StagePlan, x: jnp.ndarray, weights: Sequence[jnp.ndarray],
              interpret: bool = False) -> jnp.ndarray:
    """Execute one stage = optional stem kernel + per-block kernels.

    x (prepared by the XLA-side helpers below):
      stem entry:     (B, 27, h_out+8, 128)     — ``space_to_depth_stem``
      stride-2 entry: (B, 4, cin, h_out+8, 128) — ``space_to_depth_phases``
      stride-1 chain: (B, cin, h_out, 128)      — previous stage's output
    Returns (B, cout_last, h_out, 128) bf16 (lane-padded NCHW).
    ``weights``: stem pair (if any) followed by 10 grouped arrays per block
    (the order ``fold_block_weights`` emits)."""
    h = plan.h_out
    it = iter(weights)
    if plan.stem:
        x = run_stem(plan.c_stem, h, x, [next(it), next(it)], interpret=interpret)
    for bp in plan.blocks:
        w = [next(it) for _ in range(10)]
        x = run_block(bp, h, x, w, interpret=interpret)
    return x


# ---------------------------------------------------------------------------
# Weight folding (grouped layouts) from flax EfficientNetBackbone params
# ---------------------------------------------------------------------------


def _vec(v):
    return jnp.asarray(v, jnp.float32).reshape(1, -1)


def _pad_to(v: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    pad = [(0, 0)] * v.ndim
    pad[axis] = (0, size - v.shape[axis])
    return jnp.pad(v, pad)


def fold_block_weights(params: Dict, stats: Dict, bp: BlockPlan) -> List[jnp.ndarray]:
    """Fold one flax MBConvBlock into grouped kernel weights.

    Order: [w_exp (G,GROUP,cin) bf16, b_exp (G,1,GROUP) f32,
    taps (G,k²,GROUP) f32, b_dw (G,1,GROUP) f32, w_se1 (G,cse,GROUP) f32,
    b_se1 (1,cse) f32, w_se2 (cexp_pad,cse) f32, b_se2 (1,cexp_pad) f32,
    w_proj (G,cout,GROUP) bf16, b_proj (1,cout) f32]. Channels beyond cexp
    are zero-padded end to end: the padded dw outputs are exactly zero
    (zero taps + zero bias under silu) and every consumer's padded columns
    are zero, so no garbage flows anywhere. No-expand blocks use an
    identity 'expansion' matmul (no activation applied in-kernel)."""
    G, cp, grp = bp.n_groups, bp.cexp_pad, bp.group
    k2 = bp.kernel ** 2

    if bp.has_expand:
        ke, be = fold_bn(params["expand_conv"]["kernel"][0, 0], params["bn0"], stats["bn0"])
        w_exp = ke.T  # (cexp, cin)
    else:
        w_exp = jnp.eye(bp.cexp, bp.cin, dtype=jnp.float32)
        be = jnp.zeros((bp.cexp,), jnp.float32)
    w_exp = _pad_to(w_exp, cp, 0).reshape(G, grp, bp.cin).astype(jnp.bfloat16)
    b_exp = _pad_to(be.reshape(1, -1), cp, 1).reshape(G, 1, grp).astype(jnp.float32)

    kdw, bdw = fold_bn(params["depthwise_conv"]["kernel"][:, :, 0, :],
                       params["bn1"], stats["bn1"])
    taps = _pad_to(kdw.reshape(k2, bp.cexp), cp, 1)
    taps = jnp.transpose(taps.reshape(k2, G, grp), (1, 0, 2)).astype(jnp.float32)
    b_dw = _pad_to(bdw.reshape(1, -1), cp, 1).reshape(G, 1, grp).astype(jnp.float32)

    w_se1 = _pad_to(params["se_reduce"]["kernel"][0, 0].T, cp, 1)  # (cse, cexp_pad)
    w_se1 = jnp.transpose(w_se1.reshape(bp.cse, G, grp), (1, 0, 2)).astype(jnp.float32)
    b_se1 = _vec(params["se_reduce"]["bias"])
    w_se2 = _pad_to(params["se_expand"]["kernel"][0, 0].T, cp, 0).astype(jnp.float32)
    b_se2 = _pad_to(_vec(params["se_expand"]["bias"]), cp, 1)

    kp, bb = fold_bn(params["project_conv"]["kernel"][0, 0], params["bn2"], stats["bn2"])
    w_proj = _pad_to(kp.T, cp, 1)  # (cout, cexp_pad)
    w_proj = jnp.transpose(w_proj.reshape(bp.cout, G, grp), (1, 0, 2)).astype(jnp.bfloat16)
    b_proj = _vec(bb)

    return [w_exp, b_exp, taps, b_dw, w_se1, b_se1, w_se2, b_se2, w_proj, b_proj]


def fold_stem_weights(params: Dict, stats: Dict) -> List[jnp.ndarray]:
    """Stem 3×3-s2 conv as a (C0, 27) matmul over the im2col phase stack.

    Row order of the 27-stack (must match ``space_to_depth_stem``):
    index = (dy·3 + dx)·3 + ci, taps dy, dx ∈ {0, 1, 2} (TF-SAME pads
    (0, 1) on even input, so tap dy reads input row 2y + dy)."""
    k, b = fold_bn(params["stem_conv"]["kernel"], params["stem_bn"], stats["stem_bn"])
    w = jnp.transpose(k, (3, 0, 1, 2)).reshape(k.shape[-1], 27)
    return [w.astype(jnp.bfloat16), _vec(b)]


def block_plan_from_args(args: Dict[str, Any], group: int = DEFAULT_GROUP) -> BlockPlan:
    cexp = args["in_filters"] * args["expand_ratio"]
    return BlockPlan(
        kernel=args["kernel"],
        stride=args["stride"],
        cin=args["in_filters"],
        cexp=cexp,
        cse=max(1, int(args["in_filters"] * args["se_ratio"])),
        cout=args["out_filters"],
        has_expand=args["expand_ratio"] != 1,
        residual=args["stride"] == 1 and args["in_filters"] == args["out_filters"],
        group=group,
    )


# ---------------------------------------------------------------------------
# XLA-side data preparation (cheap single-pass reshapes)
# ---------------------------------------------------------------------------

_HALO = 8  # sublane-aligned halo rows appended below the data rows


def space_to_depth_phases(x: jnp.ndarray, w_valid: int) -> jnp.ndarray:
    """(B, C, H, 128) lane-padded (cols ≥ w_valid zero) → phase planes
    (B, 4, C, H/2 + 8, 128), each lane-padded and zero-padded below.

    Phase (py, px) plane value [y, x] = input[2y + py, 2x + px]."""
    phases = []
    H = x.shape[2]
    for py in (0, 1):
        for px in (0, 1):
            p = x[:, :, py::2, px::2][..., : (w_valid + 1) // 2]
            p = jnp.pad(
                p, ((0, 0), (0, 0), (0, _HALO), (0, LANES - p.shape[-1]))
            )
            phases.append(p)
    return jnp.stack(phases, axis=1)


def space_to_depth_stem(images: jnp.ndarray) -> jnp.ndarray:
    """NHWC images (B, H, W, 3), H = W even → (B, 27, H/2 + 8, 128) im2col
    phase stack for the stem matmul (row order matches fold_stem_weights).

    TF-SAME k=3 s=2 on even input pads (0 before, 1 after): tap dy ∈
    {0, 1, 2} reads input row 2y + dy."""
    B, H, W, _ = images.shape
    x = jnp.transpose(images, (0, 3, 1, 2))  # (B, 3, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 2), (0, 2)))
    planes = []
    for dy in range(3):
        for dx in range(3):
            planes.append(x[:, :, dy : dy + H : 2, dx : dx + W : 2])
    stack = jnp.concatenate(planes, axis=1)  # (B, 27, H/2, W/2)
    return jnp.pad(
        stack, ((0, 0), (0, 0), (0, _HALO), (0, LANES - stack.shape[-1]))
    ).astype(jnp.bfloat16)
