"""vlaser-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-language-action framework.

Re-designed from scratch with the capabilities of OpenGVLab/Vlaser (see SURVEY.md):
the InternVL3-style VLM stack (InternViT + pixel-shuffle + projector + Qwen2.5),
the open-pi-zero-style flow-matching action expert with joint mixture attention,
and the RoboTwin parallel-decoding policy head — all built on jax.sharding meshes,
jitted scan loops, and Pallas kernels rather than CUDA/NCCL/DeepSpeed.
"""

__version__ = "0.1.0"
