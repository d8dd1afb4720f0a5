"""FOCUS-TPU: a TPU-native JAX video-understanding framework.

A ground-up rebuild of the FOCUS framework (ORViT + PySlowFast + STEVE)
designed for TPU: functional pytree models under jit/pjit over a device
mesh, fused Pallas kernels for the hot ops (trajectory attention,
RoIAlign, box-layout splat, slot attention), and a device-resident
preprocessing graph feeding the step function.
"""

__version__ = "0.1.0"
