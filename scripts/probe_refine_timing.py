"""On-chip timing for the shipped 64^2 cascade refiner.

Times FaceDetector's one-dispatch detect graph at the 320^2 detection
canvas with refine=False vs refine=True (top_k=4), f32 host-API stack
(the fused bf16 serving pipeline does not include refinement; this is
the opt-in host-API cost). Sync pattern per CLAUDE.md: bracket between
two transfers; jnp.zeros does not warm the uint8 path.
"""
import sys, time

from deepfake_vit_tpu.utils import enable_compilation_cache

enable_compilation_cache()
import jax
import numpy as np

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
print(f"device: {dev}", file=sys.stderr)

B = 128
rng = np.random.default_rng(0)
frames_host = rng.integers(0, 255, size=(B, 320, 320, 3), dtype=np.uint8)
# warm the first-uint8 transfer path with a tiny real host buffer
jax.device_get(jax.device_put(np.zeros((8, 8, 3), np.uint8), dev))
frames = jax.device_put(frames_host, dev)
jax.device_get(np.asarray(frames)[0, 0, 0])  # settle the upload


def _sync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jax.device_get([l.ravel()[0] for l in leaves if hasattr(l, "ravel")])


def time_fn(fn, *a, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / iters


from deepfake_vit_tpu.preprocessing.detector import FaceDetector

results = {}
for refine in (False, True):
    with jax.default_device(cpu):
        det = FaceDetector(
            confidence_threshold=0.3, input_size=(320, 320), refine=refine
        )
    dv = jax.device_put(det.variables, dev)
    rv = jax.device_put(det.refiner_variables, dev)
    t = time_fn(lambda f, dv=dv, rv=rv, det=det: det._detect_jit(dv, rv, f), frames)
    results[refine] = t
    print(
        f"refine={refine}: {t*1e3:.2f} ms @ b{B} ({B/t:.0f} frames/s)",
        flush=True,
    )

d = (results[True] - results[False]) * 1e3
print(
    f"refine stage delta: +{d:.2f} ms @ b{B} "
    f"({d/B*1e3:.1f} us/frame, top_k=4 -> {B*4} crops re-scored)",
    flush=True,
)
