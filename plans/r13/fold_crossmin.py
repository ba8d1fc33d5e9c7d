#!/usr/bin/env python
"""Fold per-query cross-sample minima over bench detail samples.

Usage: python plans/r13/fold_crossmin.py out.json sample1.json [sample2.json ...]

Each input is a bench.py detail artifact ({"queries_sec_min": {...}}).
The output maps query -> min over samples — the only noise-robust
statistic this host permits (its CPU availability swings 2-28x between
identical runs; see OPTIMIZATION_r13.md measurement methodology).
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *paths = sys.argv[1:]
    fold: dict[str, float] = {}
    for p in paths:
        with open(p) as f:
            q = json.load(f)["queries_sec_min"]
        for k, v in q.items():
            fold[k] = min(fold.get(k, float("inf")), v)
    with open(out_path, "w") as f:
        json.dump(dict(sorted(fold.items())), f, indent=1)
    print(json.dumps({"n": len(fold), "total": round(sum(fold.values()), 2),
                      "samples": len(paths)}))


if __name__ == "__main__":
    main()
