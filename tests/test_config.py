"""Settings + RC-file round-trip (reference shared/config.py:39-68) and
the profiling registry (reference shared/helper.py FunctionTimer)."""

import importlib
import os

import numpy as np


def test_settings_rc_roundtrip(tmp_path, monkeypatch):
    import quemb_tpu.config as config

    rc = tmp_path / "rc.yml"
    monkeypatch.setenv("QUEMB_TPU_RC", str(rc))
    config.dump_settings(rc)
    assert rc.exists()
    # edit the RC and reload: the override must be picked up
    text = rc.read_text().replace(
        "INTEGRAL_TRANSFORM_MAX_MEMORY: 50.0",
        "INTEGRAL_TRANSFORM_MAX_MEMORY: 7.5",
    )
    rc.write_text(text)
    importlib.reload(config)
    try:
        assert config.settings.INTEGRAL_TRANSFORM_MAX_MEMORY == 7.5
    finally:
        monkeypatch.delenv("QUEMB_TPU_RC")
        importlib.reload(config)
    assert config.settings.INTEGRAL_TRANSFORM_MAX_MEMORY == 50.0


def test_function_timer_registry(capsys):
    from quemb_tpu.utils.profiling import print_timings, timer

    @timer.timeit
    def _work(n):
        return float(np.arange(n).sum())

    assert _work(100) == 4950.0
    print_timings()
    out = capsys.readouterr().out
    assert "_work" in out
