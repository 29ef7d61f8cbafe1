"""ViT fallback model family: shapes, contract, HF-checkpoint conversion
parity vs transformers (available in this image, reference fallback path
``task(less_cpu_intensive_ver).ipynb`` cell 15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models.vit import ViTClassifier, convert_hf_vit


def test_vit_contract():
    model = ViTClassifier(variant="tiny16", image_size=64)
    imgs = jnp.ones((2, 64, 64, 3)) * 0.2
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, imgs)
    logits, feats = model.apply(variables, imgs, return_features=True)
    assert logits.shape == (2, 2)
    assert feats.shape == (2, 192)
    probs = model.apply(variables, imgs, method=model.predict)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_hf_vit_conversion_parity():
    """Random-init HF ViT (tiny config) vs converted flax model on same input."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = transformers.ViTConfig(
        hidden_size=192, num_hidden_layers=12, num_attention_heads=3,
        intermediate_size=768, image_size=64, patch_size=16, num_labels=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = transformers.ViTForImageClassification(cfg).eval()
    sd = hf.state_dict()

    variables = convert_hf_vit(sd, variant="tiny16")
    model = ViTClassifier(variant="tiny16", image_size=64)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    logits, _ = model.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        ref = hf(torch.tensor(x.transpose(0, 3, 1, 2))).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)
