"""micformer_tpu — TPU-native multimodal 3D medical image segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
fxxJuses/MICFormer (MM-WHS whole-heart segmentation: data pipeline, model zoo,
Dice+BCE training, sliding-window inference, distributed execution), designed
TPU-first: one model registry behind one config/CLI, `jit`/`pjit` end-to-end,
sharding via `jax.sharding.Mesh`, fused Pallas kernels on the hot paths.

Reference layer map: /root/reference (see SURVEY.md). This package is NOT a
port — architecture and kernels are designed for the TPU compilation model.
"""

__version__ = "0.1.0"

from micformer_tpu import registry  # noqa: F401

build_model = registry.build  # convenience: micformer_tpu.build_model("micformer")
