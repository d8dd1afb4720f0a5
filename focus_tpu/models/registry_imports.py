"""Import every model module so its @MODEL_REGISTRY.register() runs."""

import focus_tpu.models.steve.steve  # noqa: F401

# Backbones registered as they land:
try:
    import focus_tpu.models.motionformer  # noqa: F401
except ImportError:
    pass
try:
    import focus_tpu.models.mvit  # noqa: F401
except ImportError:
    pass
try:
    import focus_tpu.models.resnet_video  # noqa: F401  (ResNet/SlowFast/X3D)
except ImportError:
    pass
