"""Import dataset modules for registration side effects."""

import focus_tpu.datasets.movi_e  # noqa: F401
import focus_tpu.datasets.synthetic  # noqa: F401

for _mod in ("ssv2", "kinetics", "epickitchens", "ava_dataset", "charades",
             "cholec80", "imagenet"):
    try:
        __import__(f"focus_tpu.datasets.{_mod}")
    except ImportError:
        pass
