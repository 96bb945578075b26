"""tools/profile_device trace parsing: lane selection, category/source
aggregation, FLOPs accounting — on a synthetic perfetto trace shaped
like the TPU runtime's output (ph=M lane metadata + ph=X op events)."""
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _mk_events():
    ev = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # module-level event must NOT be double counted
        {"ph": "X", "pid": 3, "tid": 1, "name": "jit_step", "ts": 0,
         "dur": 1000.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.1", "ts": 0,
         "dur": 600.0,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "3000", "source": "a.py:1"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "copy.1", "ts": 600,
         "dur": 300.0,
         "args": {"hlo_category": "data formatting", "model_flops": "0",
                  "source": "b.py:2"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.2", "ts": 900,
         "dur": 100.0,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "1000", "source": "a.py:1"}},
    ]
    return ev


def test_aggregate_device_lane():
    from profile_device import _aggregate

    agg = _aggregate(_mk_events())
    assert agg["on_device"]
    assert agg["total"] == 1000.0  # module event excluded
    assert agg["by_cat"]["convolution fusion"] == 700.0
    assert agg["by_cat"]["data formatting"] == 300.0
    assert agg["by_src"]["convolution fusion @ a.py:1"] == 700.0
    assert agg["flops"] == 4000.0


def test_aggregate_host_fallback():
    from profile_device import _aggregate

    ev = [e for e in _mk_events()
          if not (e.get("tid") == 2 and e.get("ph") == "X")]
    # relabel the module lane as a host lane; no XLA Ops events remain
    agg = _aggregate(ev)
    assert not agg["on_device"]
    assert agg["total"] == 0.0  # only the module-lane event, excluded


def test_load_trace_events(tmp_path):
    from profile_device import _load_trace_events

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as fp:
        json.dump({"traceEvents": _mk_events()}, fp)
    ev = _load_trace_events(str(tmp_path))
    assert len(ev) == len(_mk_events())


def test_report_renders():
    from profile_device import _aggregate, _report

    body = _report(_aggregate(_mk_events()), steps=2)
    assert "convolution fusion" in body
    assert "ms/step" in body
    assert "TFLOP/s" in body


def test_report_category_drilldown():
    from profile_device import _aggregate, _report_category

    body = _report_category(_aggregate(_mk_events()), steps=2,
                            category="data formatting")
    assert "copy.1" in body
    assert "b.py:2" in body
    assert "30.0%" in body  # 300 of 1000 us
    # ops from other categories are excluded
    assert "fusion.1" not in body
