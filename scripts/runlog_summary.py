"""Compact summary of a training run log (RUNLOG_*.jsonl): schedule
coverage, point-count trajectory, loss trend, pace, and capacity events.

Usage: python scripts/runlog_summary.py RUNLOG_r5.jsonl
"""

import json
import sys

import numpy as np


def summarize(path):
    ticks, events = [], []
    for line in open(path):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        (events if "event" in r else ticks).append(r)
    if not ticks:
        return {"path": path, "ticks": 0, "events": len(events)}
    its = np.array([t["iter"] for t in ticks])
    ts = np.array([t["elapsed_s"] for t in ticks])
    pts = np.array([t.get("points", 0) for t in ticks])
    loss = np.array([t.get("loss", np.nan) for t in ticks])
    k = max(1, len(ticks) // 10)
    out = {
        "path": path,
        "first_iter": int(its[0]), "last_iter": int(its[-1]),
        "elapsed_s": float(ts[-1]),
        "s_per_iter_overall": float((ts[-1] - ts[0])
                                    / max(its[-1] - its[0], 1)),
        "s_per_iter_recent": float((ts[-1] - ts[-k]) /
                                   max(its[-1] - its[-k], 1)),
        "points_final": int(pts[-1]), "points_peak": int(pts.max()),
        "loss_first": float(loss[0]), "loss_final": float(loss[-1]),
        "loss_last10pct_mean": float(np.nanmean(loss[-k:])),
        "events": [e.get("event") for e in events],
    }
    return out


if __name__ == "__main__":
    for p in sys.argv[1:] or ["RUNLOG_r5.jsonl"]:
        print(json.dumps(summarize(p)))
