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
