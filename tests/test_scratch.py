"""Scratch-manager contract tests (reference tests/scratch_manager_test.py).

Mirrors the reference's tested WorkDir behavior: adopting an existing
directory, double-cleanup raising, context-manager removal on both clean
and exceptional exit, user-defined relative paths resolving to absolute,
and PID-based naming under a user-defined root.
"""

import os
from pathlib import Path
from tempfile import mkdtemp

import pytest

from quemb_tpu.utils.scratch import WorkDir


def test_already_created():
    my_tmp = Path(mkdtemp())
    assert my_tmp.exists()

    scratch = WorkDir(my_tmp)
    scratch.cleanup()
    assert not my_tmp.exists()

    with pytest.raises(FileNotFoundError):
        scratch.cleanup()


def test_removed_also_upon_error():
    # reference scratch_manager_test.py:23-34: the context manager removes
    # the scratch dir whether or not an exception is propagating
    my_tmp = Path(mkdtemp())
    with pytest.raises(ValueError):
        with WorkDir(my_tmp):
            raise ValueError
    assert not my_tmp.exists()

    my_tmp2 = Path(mkdtemp())
    with WorkDir(my_tmp2):
        pass
    assert not my_tmp2.exists()


def test_creation_user_defined(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    test_dir = Path("./scratch_test")
    with WorkDir("./scratch_test") as scratch:
        assert test_dir.exists()
        assert scratch.path == test_dir.resolve()
    assert not test_dir.exists()


def test_creation_pid(tmp_path, monkeypatch):
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    pid = os.getpid()
    with WorkDir(path=tmp_path / "scratch_root") as scratch_root:
        with WorkDir.from_environment(
            user_defined_root=scratch_root.path
        ) as d:
            assert d.path == scratch_root.path / f"quemb_tpu_{pid}"


def test_slurm_naming(tmp_path, monkeypatch):
    monkeypatch.setenv("SLURM_JOB_ID", "424242")
    with WorkDir.from_environment(user_defined_root=tmp_path) as d:
        assert d.path.name == "quemb_tpu_424242"


def test_make_subdir(tmp_path):
    with WorkDir(tmp_path / "root") as root:
        sub = root.make_subdir("frag_0")
        assert sub.path.exists()
        assert sub.path == root.path / "frag_0"
        # subdirs do not self-clean: the owning WorkDir removes the tree
    assert not (tmp_path / "root").exists()
