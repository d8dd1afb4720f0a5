"""Environment / path handling (counterpart of reference
``slowfast/utils/env.py``, which wires iopath pathmgr singletons). We use
the plain filesystem; this indirection point exists so remote storage
(e.g. gcsfs) can be added without touching call sites."""

import os


class PathManager:
    @staticmethod
    def open(path, mode="r", **kwargs):
        return open(path, mode, **kwargs)

    @staticmethod
    def exists(path) -> bool:
        return os.path.exists(path)

    @staticmethod
    def isdir(path) -> bool:
        return os.path.isdir(path)

    @staticmethod
    def ls(path):
        return sorted(os.listdir(path))

    @staticmethod
    def mkdirs(path) -> None:
        os.makedirs(path, exist_ok=True)


pathmgr = PathManager()
checkpoint_pathmgr = PathManager()
