"""Device-op profiling helpers.

The reference has no tracing/profiling at all (SURVEY.md section 5 — only a
wall-clock log line).  These helpers wrap ``jax.profiler`` and digest its
trace into per-op device-time tables, which is how every kernel in this
framework was tuned (see git history / experiments/profile_*.py).

Usage::

    from quantization_tpu.utils.profiling import profile_device_ops
    table = profile_device_ops(lambda: jax.block_until_ready(f(x)))
    for row in table[:10]:
        print(row)  # {'source': ..., 'ms': ..., 'count': ...}
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Dict, List

import jax


def profile_device_ops(run: Callable[[], None], trace_dir: str | None = None) -> List[Dict]:
    """Run ``run()`` under ``jax.profiler.trace`` and return device-op time
    grouped by XLA source attribution (falling back to fused-op name),
    sorted by total milliseconds descending.

    ``run`` must block until the work is done (fetch results or call
    ``jax.block_until_ready``); otherwise the trace window closes early.
    """
    own = trace_dir is None
    if own:
        trace_dir = tempfile.mkdtemp(prefix="qtpu_trace_")
    with jax.profiler.trace(trace_dir):
        run()
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        return []
    with gzip.open(sorted(files)[-1]) as fh:
        tr = json.load(fh)
    events = tr.get("traceEvents", [])
    # Find device pids (process names other than CPU host threads).
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = (e.get("args") or {}).get("name", "")
            if name.startswith("/device:") and "CPU" not in name:
                dev_pids.add(e.get("pid"))
    if not dev_pids:  # CPU backend: fall back to everything with hlo-ish names
        dev_pids = {e.get("pid") for e in events if e.get("ph") == "X"}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue  # outer program envelope
        args = e.get("args") or {}
        key = args.get("source_info") or args.get("tf_op") or name.split(".")[0]
        agg[key] += e["dur"]
        cnt[key] += 1
    return [
        {"source": k, "ms": round(v / 1000.0, 3), "count": cnt[k]}
        for k, v in agg.most_common()
    ]
