"""Import every model module so its @MODEL_REGISTRY.register() runs.

All backbones depend only on baked-in libraries (jax/flax/numpy), so
imports are unconditional — a broken model module fails loudly instead
of silently vanishing from the registry (round-2 verdict)."""

import focus_tpu.models.motionformer  # noqa: F401
import focus_tpu.models.mvit  # noqa: F401
import focus_tpu.models.ptv_variants  # noqa: F401  (CSN/R(2+1)D + PTV aliases)
import focus_tpu.models.resnet_video  # noqa: F401  (ResNet/SlowFast/X3D)
import focus_tpu.models.steve.steve  # noqa: F401
