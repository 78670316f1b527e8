"""ViT-Adapter TPU: a TPU-native (JAX/XLA/Pallas/pjit) dense-prediction framework.

A from-scratch rebuild of the capabilities of the ViT-Adapter reference
(`Vision Transformer Adapter for Dense Predictions`, ICLR 2023) designed
TPU-first: NHWC layouts, static shapes, bfloat16 compute with fp32 masters,
XLA-compiled collectives over `jax.sharding.Mesh`, and Pallas kernels for
the hot ops.
"""

__version__ = "0.1.0"
