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


def test_bufpool_roundtrip(tmp_path):
    """Pooled row buffers are reused after the sink's writes complete, and
    the pool rejects views / foreign dtypes."""
    import numpy as np
    from gsalign_tpu.utils import bufpool
    from gsalign_tpu.pipeline.output import AsyncSink

    bufpool._POOL.clear()       # other tests share the process-global pool
    b = bufpool.get(1024)
    assert b.dtype == np.uint8 and b.shape[0] >= 1024
    b[:4] = (65, 66, 67, 68)
    sink = AsyncSink()
    p = tmp_path / "out.bin"
    sink.submit(str(p), "wb", [memoryview(b[:4])], recycle=[b])
    sink.close()
    assert p.read_bytes() == b"ABCD"
    b2 = bufpool.get(1024)          # the recycled buffer comes back
    assert b2 is b
    bufpool.put(b2[:10])            # views are rejected
    assert bufpool.get(4) is not None
    bufpool.put(np.zeros(4, dtype=np.int32))   # wrong dtype rejected
