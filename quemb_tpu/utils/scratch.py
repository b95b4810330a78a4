"""Scratch-directory management (reference shared/manage_scratch.py).

``WorkDir`` creates a uniquely-named scratch area (SLURM job id or PID),
supports use as a context manager, per-fragment subdirectories, and cleanup
that runs only on clean exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
from pathlib import Path

from quemb_tpu.config import settings

_clean_exit = False


def _mark_clean():
    global _clean_exit
    _clean_exit = True


def register_clean_exit(*paths: Path) -> None:
    """Delete the given paths at interpreter exit, but only on clean exit."""

    def hook():
        if sys.exc_info()[0] is None:
            for p in paths:
                shutil.rmtree(p, ignore_errors=True)

    atexit.register(hook)


class WorkDir:
    """A scratch working directory."""

    def __init__(
        self,
        path: str | Path | None = None,
        cleanup_at_end: bool = True,
    ):
        if path is None:
            job_id = os.environ.get("SLURM_JOB_ID", str(os.getpid()))
            path = Path(settings.SCRATCH_ROOT) / f"quemb_tpu_{job_id}"
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.cleanup_at_end = cleanup_at_end
        if cleanup_at_end:
            register_clean_exit(self.path)

    @classmethod
    def from_environment(cls, **kwargs) -> "WorkDir":
        return cls(None, **kwargs)

    def make_subdir(self, name: str) -> "WorkDir":
        return WorkDir(self.path / name, cleanup_at_end=False)

    def cleanup(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    def __truediv__(self, other) -> Path:
        return self.path / other

    def __fspath__(self) -> str:
        return str(self.path)

    def __enter__(self) -> "WorkDir":
        return self

    def __exit__(self, exc_type, exc, tb):
        if self.cleanup_at_end and exc_type is None:
            self.cleanup()
        return False

    def __repr__(self) -> str:
        return f"WorkDir({self.path})"
