"""Summarise a JAX profiler trace without tensorboard.

The env's tensorboard_plugin_profile is broken (pywrap mismatch), so this
parses the Chrome-trace JSON that `jax.profiler.start_trace` writes
(PERF.md: device ops live on threads named "XLA Ops") and aggregates
device-op durations by fusion/op name.

Usage:
    python -m fairdiff.utils.trace_summary /tmp/bench_trace [--top 30]

or programmatically:
    from fairdiff.utils.trace_summary import summarize_trace
    rows = summarize_trace("/tmp/bench_trace")
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys
from pathlib import Path


def _latest_trace_file(log_dir: str | Path) -> Path:
    files = sorted(
        Path(log_dir).rglob("*.trace.json.gz"),
        key=lambda p: p.stat().st_mtime,
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    return files[-1]


_BUCKET_RES = [
    ("conv", re.compile(r"^%?(convolution|conv)")),
    ("matmul", re.compile(r"^%?(dot|cublas|gemm)")),
    # split the first-party flash kernels before the catch-all
    # attention bucket (the roofline ledger needs fwd/dq/dkv apart)
    ("flash-dq", re.compile(r"bwd_dq", re.I)),
    ("flash-dkv", re.compile(r"bwd_dkv", re.I)),
    ("flash-merged", re.compile(r"bwd_merged", re.I)),
    ("flash-fwd", re.compile(r"flash_kernel", re.I)),
    ("geglu", re.compile(r"geglu|_dx_kernel", re.I)),
    ("attention-pallas", re.compile(r"flash|attn", re.I)),
    ("pallas", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("reduce", re.compile(r"^%?(reduce|convert_reduce)|_reduce_fusion")),
    ("fusion", re.compile(r"fusion")),
    ("copy/transpose", re.compile(r"^%?(copy|transpose|bitcast|reshape)")),
    ("collective", re.compile(r"all-reduce|all-gather|reduce-scatter|psum")),
]


def _bucket(name: str) -> str:
    for label, rx in _BUCKET_RES:
        if rx.search(name):
            return label
    return "other"


def summarize_trace(
    log_dir: str | Path, top: int = 30
) -> dict[str, object]:
    """Aggregate device-op wall time from the newest trace under log_dir.

    Returns {"total_s", "by_bucket": {bucket: s}, "top_ops": [(name, s,
    count)]}. Only events on "XLA Ops" threads (device execution) count.
    """
    path = _latest_trace_file(log_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    xla_tids: set[tuple] = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in str(e.get("args", {}).get("name", "")):
                xla_tids.add((e.get("pid"), e.get("tid")))

    # self time: events on one thread nest (while/call scopes contain their
    # body ops) — subtract each event's children so scopes don't double
    # count. Stack-sweep over start-sorted events per thread.
    per_tid: dict[tuple, list] = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in xla_tids:
            continue
        per_tid[(e["pid"], e["tid"])].append(
            (e.get("ts", 0), e.get("dur", 0), e.get("name", "?"))
        )

    per_op: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
    for rows in per_tid.values():
        rows.sort(key=lambda r: (r[0], -r[1]))
        # stack entries: [end_ts, name, dur_us, child_us]
        stack: list[list] = []

        def finalize(entry):
            _, name, dur_us, child_us = entry
            per_op[name][0] += max(dur_us - child_us, 0) / 1e6
            per_op[name][1] += 1

        for ts, dur, name in rows:
            while stack and ts >= stack[-1][0]:
                done = stack.pop()
                finalize(done)
                if stack:
                    stack[-1][3] += done[2]
            stack.append([ts + dur, name, dur, 0.0])
        while stack:
            done = stack.pop()
            finalize(done)
            if stack:
                stack[-1][3] += done[2]

    by_bucket: dict[str, float] = collections.defaultdict(float)
    for name, (sec, _) in per_op.items():
        by_bucket[_bucket(name)] += sec
    top_ops = sorted(
        ((n, s, c) for n, (s, c) in per_op.items()),
        key=lambda r: -r[1],
    )[:top]
    return {
        "trace_file": str(path),
        "total_s": sum(s for s, _ in per_op.values()),
        "by_bucket": dict(
            sorted(by_bucket.items(), key=lambda kv: -kv[1])
        ),
        "top_ops": top_ops,
    }


def main(argv: list[str]) -> None:
    if not argv or argv[0].startswith("-"):
        print(__doc__)
        raise SystemExit(2)
    top = 30
    if "--top" in argv:
        top = int(argv[argv.index("--top") + 1])
    s = summarize_trace(argv[0], top=top)
    print(f"# {s['trace_file']}")
    print(f"device total: {s['total_s']:.3f} s")
    print("\nby bucket:")
    for k, v in s["by_bucket"].items():
        print(f"  {k:>18}: {v:8.3f} s  ({100 * v / max(s['total_s'], 1e-9):.1f}%)")
    print(f"\ntop {top} ops:")
    for name, sec, count in s["top_ops"]:
        print(f"  {sec:8.3f} s  x{count:<6} {name[:100]}")


if __name__ == "__main__":
    main(sys.argv[1:])
