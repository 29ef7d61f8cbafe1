"""deepfake_vit_tpu — a TPU-native deepfake-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
Ji-Hyeon212/Deepfake-ViT reference stack (face detection → landmark
alignment → quality scoring → EfficientNet-B4 + hybrid attention →
classification), redesigned around batched pure functions, explicit
`jax.sharding` meshes, and compiler-friendly control flow.

Layer map (mirrors reference `src/__init__.py:1-20`, rebuilt TPU-first):

- ``deepfake_vit_tpu.ops``            batched XLA/Pallas primitives (warp, NMS, quality, ...)
- ``deepfake_vit_tpu.models``         flax model zoo (EfficientNet, attention, heads)
- ``deepfake_vit_tpu.preprocessing``  detect → align → quality pipeline (Stage 1)
- ``deepfake_vit_tpu.data``           CSV-driven datasets + host loading (bridge)
- ``deepfake_vit_tpu.training``       losses, trainer, evaluator, metrics (engine)
- ``deepfake_vit_tpu.parallel``       mesh / sharding / collectives
- ``deepfake_vit_tpu.utils``          io, checkpointing, logging, config
"""

__version__ = "0.1.0"
