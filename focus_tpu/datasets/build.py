"""Dataset registry (counterpart of reference ``slowfast/datasets/build.py``)."""

from focus_tpu.utils.registry import Registry

DATASET_REGISTRY = Registry("DATASET")


def build_dataset(dataset_name: str, cfg, split: str):
    """Instantiate the dataset registered under ``dataset_name`` (the
    reference capitalises the key, datasets/build.py:22-31)."""
    import focus_tpu.datasets.registry_imports  # noqa: F401

    name = dataset_name.capitalize()
    return DATASET_REGISTRY.get(name)(cfg, split)
