"""Native C++ decode core: parity with the Python/cv2 path + throughput."""

import time

import numpy as np
import pytest

from deepfake_vit_tpu.data import native_loader
from deepfake_vit_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    paths = []
    for i in range(32):
        img = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
        p = d / f"{i:03d}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    # one jpg + one non-square
    img = rng.integers(0, 255, (180, 240, 3), dtype=np.uint8)
    pj = d / "x.jpg"
    cv2.imwrite(str(pj), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    paths.append(str(pj))
    return paths


def test_native_matches_python(image_files):
    import cv2

    dec = native_loader.NativeDecoder(num_threads=4)
    batch, failed = dec.decode_batch(image_files, image_size=224, normalize=True)
    assert batch.shape == (len(image_files), 224, 224, 3)
    assert not failed.any()

    for i in (0, 7, len(image_files) - 1):
        bgr = cv2.imread(image_files[i])
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if rgb.shape[:2] != (224, 224):
            rgb = cv2.resize(rgb, (224, 224), interpolation=cv2.INTER_LINEAR)
        ref = (rgb.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(batch[i], ref, atol=1e-4)
    dec.close()


def test_native_failure_flags(image_files, tmp_path):
    bad = str(tmp_path / "nope.png")
    dec = native_loader.NativeDecoder(num_threads=2)
    batch, failed = dec.decode_batch([image_files[0], bad], image_size=64)
    assert failed.tolist() == [False, True]
    assert batch[1].max() == 0.0  # failed slot zero-filled
    dec.close()


def test_native_faster_than_python(image_files):
    """Sanity: the C++ pool shouldn't be slower than per-item Python+cv2."""
    import cv2

    dec = native_loader.NativeDecoder(num_threads=8)
    dec.decode_batch(image_files)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        dec.decode_batch(image_files)
    t_native = time.perf_counter() - t0

    def py_load(p):
        rgb = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        if rgb.shape[:2] != (224, 224):
            rgb = cv2.resize(rgb, (224, 224))
        return (rgb.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    t0 = time.perf_counter()
    for _ in range(5):
        np.stack([py_load(p) for p in image_files])
    t_python = time.perf_counter() - t0
    dec.close()
    assert t_native < t_python * 1.5  # generous: CI variance
