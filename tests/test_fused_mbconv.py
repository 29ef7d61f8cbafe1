"""Fused MBConv kernel: numerical parity vs the flax block after BN folding
(interpret mode; speed comparison lives in BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepfake_vit_tpu.models.efficientnet import MBConvBlock
from deepfake_vit_tpu.ops.pallas.fused_mbconv import (
    fold_bn,
    fold_mbconv_params,
    fused_mbconv,
)


def test_fold_bn_identity():
    k = jnp.ones((4, 8))
    params = {"scale": jnp.ones(8), "bias": jnp.zeros(8)}
    stats = {"mean": jnp.zeros(8), "var": jnp.ones(8) - 1e-3}
    k2, b = fold_bn(k, params, stats)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-6)


@pytest.mark.parametrize("cin,cout,exp,H", [(32, 32, 6, 28), (24, 24, 1, 28), (16, 32, 6, 14)])
def test_fused_matches_flax(rng, cin, cout, exp, H):
    blk = MBConvBlock(
        kernel=3, stride=1, expand_ratio=exp, in_filters=cin,
        out_filters=cout, se_ratio=0.25, dtype=jnp.float32,
    )
    x = jnp.asarray(rng.normal(0, 1, (2, H, H, cin)), jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0.2, 0.1, a.shape), jnp.float32) ** 2 + 0.5,
        v["batch_stats"],
    )
    ref = blk.apply({"params": v["params"], "batch_stats": stats}, x)
    folded = fold_mbconv_params(v["params"], stats, exp)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mbconv(x, folded, H, H, exp)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.max() < 0.05 * max(scale, 1.0)
    assert err.mean() < 0.01
