"""Isolated warp/crop kernel timings per tap-construction mode.

Times, on the real chip (one process, one timing protocol):
  - warp_affine_pallas on window-crop-shaped inputs (N×w×w×3 → 224²)
    for each construction in {legacy, uw, uw16} — the measured wall is
    tap-weight construction (8.2 of 12.9 ms at B=128/w160, BASELINE.md);
  - crop_window_pool_pallas / crop_window_frac_pallas on 640² frames for
    {legacy, mxu}.

Usage:
    python scripts/probe_warp_kernel.py [--batch 128] [--window 160]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--window", type=int, default=160)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--skip-crop", action="store_true")
    ap.add_argument("--skip-warp", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepfake_vit_tpu.ops.pallas.warp_kernel import (
        crop_window_frac_pallas,
        crop_window_pool_pallas,
        warp_affine_pallas,
    )
    from deepfake_vit_tpu.ops.warp import (
        frac_window_levels,
        max_window_levels,
        window_geometry,
        window_geometry_frac,
    )
    from deepfake_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    N, w = args.batch, args.window
    rng = np.random.default_rng(0)

    def _sync(x):
        return jax.device_get(jnp.ravel(x)[0])

    def _time(fn, *a, **kw):
        t0 = time.perf_counter()
        _sync(fn(*a, **kw))
        print(f"    compile+run {time.perf_counter() - t0:.1f} s",
              file=sys.stderr)
        for _ in range(args.warmup):
            _sync(fn(*a, **kw))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(*a, **kw)
        _sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    if not args.skip_warp:
        crops = jnp.asarray(rng.uniform(0, 255, (N, w, w, 3)), jnp.bfloat16)
        # Window→224² affines like A_win: mild scale + rotation.
        th = rng.uniform(-0.3, 0.3, N)
        sc = (w - 10) / 224.0
        Ms = np.zeros((N, 2, 3), np.float32)
        Ms[:, 0, 0] = sc * np.cos(th)
        Ms[:, 0, 1] = -sc * np.sin(th)
        Ms[:, 1, 0] = sc * np.sin(th)
        Ms[:, 1, 1] = sc * np.cos(th)
        Ms[:, :, 2] = 4.0
        A = jnp.asarray(Ms)
        for mode in ("legacy", "uw", "uw16", "int8"):
            # Fail-soft: a Mosaic rejection of one construction (the int8
            # s8-dot is toolchain-dependent) must not kill the sweep.
            try:
                ms = _time(warp_affine_pallas, crops, A, (224, 224),
                           inverse=True, construction=mode)
                print(f"warp_affine_pallas b{N} w{w} {mode}: {ms:.2f} ms")
            except Exception as e:
                msg = str(e).splitlines()[0][:160] if str(e) else ""
                print(f"warp_affine_pallas b{N} w{w} {mode}: FAILED "
                      f"({type(e).__name__}: {msg})")

    if not args.skip_crop:
        H = W = 640
        frames = jnp.asarray(
            rng.integers(0, 256, (N, H, W * 3)), jnp.bfloat16
        )
        # Face sizes spanning the level buckets.
        spans = rng.uniform(40, 400, N).astype(np.float32)
        Ainv = np.zeros((N, 2, 3), np.float32)
        Ainv[:, 0, 0] = spans / 223.0
        Ainv[:, 1, 1] = spans / 223.0
        Ainv[:, 0, 2] = rng.uniform(0, W - spans - 1, N)
        Ainv[:, 1, 2] = rng.uniform(0, H - spans - 1, N)
        Ainv = jnp.asarray(Ainv)

        levels = max_window_levels((H, W), w)
        level, y0s, x0s, _ = window_geometry(
            Ainv, (224, 224), (H, W), w, levels, y_align=16
        )
        x0_sel = jnp.stack(x0s)[level, jnp.arange(N)]
        y0_l0 = jnp.left_shift(jnp.stack(y0s)[level, jnp.arange(N)], level)
        for mode in ("legacy", "mxu"):
            try:
                ms = _time(crop_window_pool_pallas, frames, y0_l0, x0_sel,
                           level, w, 3, levels, y_align=16, construction=mode)
                print(f"crop_pool b{N} w{w} {mode}: {ms:.2f} ms")
            except Exception as e:
                msg = str(e).splitlines()[0][:160] if str(e) else ""
                print(f"crop_pool b{N} w{w} {mode}: FAILED "
                      f"({type(e).__name__}: {msg})")

        levels_f = frac_window_levels(H, w)
        lvl, strip0s, r, off_y, x0f, _ = window_geometry_frac(
            Ainv, (224, 224), (H, W), w, levels_f, y_align=16
        )
        strip0 = strip0s[lvl, jnp.arange(N)]
        for mode in ("legacy", "mxu"):
            try:
                ms = _time(crop_window_frac_pallas, frames, strip0, lvl, r,
                           off_y, x0f, w, 3, levels_f, y_align=16,
                           construction=mode)
                print(f"crop_frac b{N} w{w} {mode}: {ms:.2f} ms")
            except Exception as e:
                msg = str(e).splitlines()[0][:160] if str(e) else ""
                print(f"crop_frac b{N} w{w} {mode}: FAILED "
                      f"({type(e).__name__}: {msg})")


if __name__ == "__main__":
    main()
