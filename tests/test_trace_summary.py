"""Trace summariser: aggregates only XLA-Ops device events."""

import gzip
import json

from fairdiff.utils.trace_summary import summarize_trace


def test_summarize_trace(tmp_path):
    events = [
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 2,
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 3,
         "args": {"name": "python"}},
        # while.1 wraps its children: only SELF time (0.5s) may count
        {"ph": "X", "pid": 1, "tid": 2, "name": "while.1", "ts": 0,
         "dur": 3_000_000},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.123", "ts": 100,
         "dur": 2_000_000},
        {"ph": "X", "pid": 1, "tid": 2, "name": "convolution.7",
         "ts": 2_100_000, "dur": 500_000},
        # sibling after the while
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.123",
         "ts": 3_100_000, "dur": 1_000_000},
        # host-side event must NOT count
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.123", "ts": 0,
         "dur": 9_000_000},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    s = summarize_trace(tmp_path)
    # total = 3.0 (fusion) + 0.5 (conv) + 0.5 (while self) = 4.0
    assert abs(s["total_s"] - 4.0) < 1e-9
    assert abs(s["by_bucket"]["fusion"] - 3.0) < 1e-9
    assert abs(s["by_bucket"]["conv"] - 0.5) < 1e-9
    assert abs(s["by_bucket"]["other"] - 0.5) < 1e-9  # while self-time
    assert s["top_ops"][0][0] == "fusion.123"
    assert s["top_ops"][0][2] == 2
