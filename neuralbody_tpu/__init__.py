"""neuralbody_tpu — TPU-native Neural Body framework.

A from-scratch JAX/XLA/Pallas implementation of the Neural Body dynamic-human
novel-view-synthesis system (reference: zju3dv/neuralbody), designed TPU-first:
static shapes, site-list sparse convolution via gather/matmul/scatter, fused
render kernels, and pjit/Mesh data parallelism.
"""
__version__ = "0.1.0"
