#!/usr/bin/env python3
"""Build the SCALE.md ratio table from two Bench JSON lines (dev tool).

Usage: python3 tools/scale_report.py <bench_small.json> <bench_big.json> <data_ratio>

Prints a markdown table of per-query seconds at both scale factors and
the time ratio, flagging entries whose growth exceeds the linearity bar
(> 1.2 x the data ratio, the VERDICT r4 threshold of ~12x for 10x data).
"""
import json
import sys


def main(small_path: str, big_path: str, data_ratio: float) -> int:
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    bar = 1.2 * data_ratio
    rows = []
    for q in sorted(small, key=lambda q: -big.get(q, 0)):
        s, b = small[q], big.get(q)
        if b is None:
            continue
        ratio = b / s if s > 0 else float("inf")
        flag = "**super-linear**" if ratio > bar else ""
        rows.append((q, s, b, ratio, flag))
    print(f"| query | sf0.1 (s) | sf1 (s) | ratio (bar {bar:.0f}x) | flag |")
    print("|---|---|---|---|---|")
    for q, s, b, r, f in rows:
        print(f"| `{q}` | {s:.2f} | {b:.2f} | {r:.1f}x | {f} |")
    n_super = sum(1 for r in rows if r[4])
    print(f"\n{len(rows)} queries; {n_super} super-linear at the {bar:.0f}x bar")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], float(sys.argv[3])))
