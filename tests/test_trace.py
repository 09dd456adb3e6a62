import time

from gsalign_tpu.utils.trace import StageTimer, device_trace


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.totals["a"] >= 0.01
    assert "a=" in t.report() and "total=" in t.report()


def test_device_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("GSALIGN_TRACE", raising=False)
    with device_trace():
        pass
