#!/usr/bin/env python
"""Offline replay harness for AdaptiveExplorer tuning.

Replays the exploration ordering over already-measured dense sweeps
(scale_report JSONs) — the same protocol scale_regression.py's
pareto_check uses — so explorer changes can be evaluated in seconds
against BOTH measured regimes:

  - v2 (saturating recall, query_noise=1.0): frontier rides nprobe at
    tiny cost spreads, heavy timing noise;
  - v3 (rank-noisy recall, query_noise=2.5): frontier = nprobe ladder
    at minimal nshort/nmid.

Usage: python scripts/explorer_replay.py [report.json ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def replay(points, make_order):
    """points: list of ((nprobe, nshort, nmid), recall, time)."""
    from qinco_tpu.search.operating_points import OperatingPoints

    by = {k: (r, t) for k, r, t in points}
    op = OperatingPoints()
    op.add_range("nprobe", sorted({k[0] for k in by}))
    op.add_range("nshort", sorted({k[1] for k in by}))
    op.add_range("nmid_short", sorted({k[2] for k in by}))
    pts = make_order(op, by)

    frontier = [
        i for i, (rec, t) in enumerate(pts)
        if not any(r2 >= rec and t2 <= t and (r2 > rec or t2 < t)
                   for r2, t2 in pts)
    ]
    nf = max(len(frontier), 1)
    stats = {"frontier_size": len(frontier)}
    for mult in (1, 2):
        k = min(mult * nf, len(pts))
        stats[f"first_{mult}x_hit"] = round(
            len(set(frontier) & set(range(k))) / nf, 3)
        cov = sum(
            any(r2 >= rec - 0.002 and t2 <= t * 1.15 for r2, t2 in pts[:k])
            for rec, t in (pts[i] for i in frontier)
        ) / nf
        stats[f"first_{mult}x_coverage"] = round(cov, 3)
    return stats


def adaptive_order(op, by):
    from qinco_tpu.search.optim_order import AdaptiveExplorer

    ex = AdaptiveExplorer(op, op.all_keys())
    out = []
    while True:
        key = ex.next()
        if key is None:
            break
        p = op.get_parameters(key)
        m = by.get((p["nprobe"], p["nshort"], p["nmid_short"]))
        if m is None:
            continue
        ex.update(p, *m)
        out.append(m)
    return out


def static_order(op, by):
    from qinco_tpu.search.optim_order import sort_experiments_by_prior

    out = []
    for key in sort_experiments_by_prior(op, op.all_keys()):
        p = op.get_parameters(key)
        m = by.get((p["nprobe"], p["nshort"], p["nmid_short"]))
        if m is not None:
            out.append(m)
    return out


def load_points(path):
    d = json.loads(Path(path).read_text())
    key = ("operating_points_cpu" if "operating_points_cpu" in d
           else "operating_points")
    return [
        ((r["parameters"]["nprobe"], r["parameters"]["nshort"],
          r["parameters"]["nmid_short"]), r["R@1"], r["t_total"])
        for r in d[key]
    ]


def main():
    paths = sys.argv[1:] or [
        "bench_artifacts/scale_report_2026-08-19.json",
        "/root/scale10m_v3/scale_report.json",
    ]
    for path in paths:
        points = load_points(path)
        print(f"== {path} ({len(points)} points)")
        print("  adaptive:", replay(points, adaptive_order))
        print("  static:  ", replay(points, static_order))


if __name__ == "__main__":
    main()
