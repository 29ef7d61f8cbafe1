"""Fused-stage backbone runner: Pallas early stages + flax tail.

Splits an EfficientNet forward at inference time into (a) the
bandwidth-bound early stages executed by the fused VMEM kernels
(``ops/pallas/fused_stages.py``) and (b) the late stages + head left to
XLA, which already runs them at reasonable MFU (BASELINE.md: blocks 16-31
≈ 21% MFU; the early stages are the ~3% MFU wall).

The split point and kernel grouping are chosen automatically: stages fuse
while their folded weights fit the per-kernel VMEM budget; resolution
groups that exceed it are subdivided. Everything stays jittable — the
runner's ``__call__`` composes pallas_calls with the cheap XLA-side
space-to-depth reshapes between them.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.pallas.fused_stages import (
    StagePlan,
    block_plan_from_args,
    group_for,
    fold_block_weights,
    fold_stem_weights,
    run_stage,
    space_to_depth_phases,
    space_to_depth_stem,
)
from .efficientnet import VARIANT_PARAMS, block_args, round_filters

# Per-kernel folded-weight budget (bytes). VMEM also holds the expand
# scratch, the dw park, and the pipelined in/out blocks.
_MIN_FUSED_H = 14  # stop fusing below this output resolution


def plan_fused_stages(
    variant: str, image_size: int = 224, min_fused_h: int = _MIN_FUSED_H
) -> Tuple[List[Tuple[StagePlan, List[int]]], int]:
    """Resolution-group plan: [(StagePlan, flat block indices)], tail_start.

    Each block runs as its own pallas_call (grid over batch × channel
    groups — see ops/pallas/fused_stages.py); plans only group blocks by
    output resolution to place the XLA-side space-to-depth preps. Fusing
    stops once the running resolution drops below ``min_fused_h``.
    """
    blocks = block_args(variant)
    h = image_size // 2  # after stem
    plans: List[Tuple[StagePlan, List[int]]] = []

    cur: List[int] = []
    cur_h_in = image_size
    cur_stem = True
    tail_start = len(blocks)

    def flush():
        nonlocal cur, cur_stem, cur_h_in
        if cur or cur_stem:
            h_out = cur_h_in // 2 if (cur_stem or (cur and blocks[cur[0]]["stride"] == 2)) else cur_h_in
            bps = tuple(
                block_plan_from_args(
                    blocks[i],
                    group=group_for(h_out, blocks[i]["kernel"], blocks[i]["stride"]),
                )
                for i in cur
            )
            plans.append(
                (
                    StagePlan(
                        blocks=bps,
                        h_in=cur_h_in,
                        stem=cur_stem,
                        c_stem=round_filters(32, VARIANT_PARAMS[variant][0]),
                    ),
                    list(cur),
                )
            )
        cur, cur_stem = [], False

    for i, args in enumerate(blocks):
        bp = block_plan_from_args(args)
        h_after = h // bp.stride
        if h_after < min_fused_h:
            tail_start = i
            break
        if bp.stride == 2 and (cur or cur_stem):
            flush()
            cur_h_in = h
        cur.append(i)
        h = h_after
        tail_start = i + 1
    flush()
    return plans, tail_start


class FusedBackboneRunner:
    """Callable: NHWC images → NHWC activations at ``tail_start``'s input.

    Construct once per (params, batch_stats); BNs are folded at build time,
    so this is an inference object — training uses the flax path.
    """

    def __init__(
        self,
        variant: str,
        params: Dict[str, Any],
        batch_stats: Dict[str, Any],
        image_size: int = 224,
        min_fused_h: int = _MIN_FUSED_H,
    ):
        self.variant = variant
        self.image_size = image_size
        self.plans, self.tail_start = plan_fused_stages(variant, image_size, min_fused_h)
        self.weights: List[List[jnp.ndarray]] = []
        for plan, idxs in self.plans:
            ws: List[jnp.ndarray] = []
            if plan.stem:
                ws += fold_stem_weights(params, batch_stats)
            for i in idxs:
                ws += fold_block_weights(
                    params[f"block_{i}"], batch_stats[f"block_{i}"],
                    block_plan_from_args(
                        block_args(variant)[i],
                        group=group_for(plan.h_out, block_args(variant)[i]["kernel"],
                                        block_args(variant)[i]["stride"]),
                    ),
                )
            self.weights.append(ws)

    def __call__(self, images: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        """images: (B, S, S, 3) normalized NHWC. Returns NHWC activations
        feeding flat block ``tail_start`` (use EfficientNetBackbone's
        ``start_block`` to finish the network)."""
        x = None
        for k, (plan, _idxs) in enumerate(self.plans):
            if plan.stem:
                xin = space_to_depth_stem(images)
            elif plan.blocks[0].stride == 2:
                xin = space_to_depth_phases(x, w_valid=plan.h_in)
            else:
                xin = x
            x = run_stage(plan, xin, self.weights[k], interpret=interpret)
        h = self.plans[-1][0].h_out
        return jnp.transpose(x[..., :h], (0, 2, 3, 1))  # NHWC
