#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from three BENCH_LOCAL.json
dumps (median-of-3 fresh-JVM basis).

Usage: python3 tools/mk_baseline_table.py run1.json run2.json run3.json
Prints the markdown rows (sorted by key) plus the run totals.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit("usage: mk_baseline_table.py run1.json run2.json run3.json "
                 "(exactly three runs — the table claims a median-of-3 basis)")
    runs = [json.load(open(p))["queries"] for p in sys.argv[1:4]]
    totals = [sum(r.values()) for r in runs]
    keys = sorted(set().union(*[set(r) for r in runs]))
    print("| query | median s | per-run |")
    print("| --- | --- | --- |")
    for k in keys:
        vals = [r.get(k) for r in runs]
        if any(v is None for v in vals):
            print(f"| {k} | MISSING | {vals} |")
            continue
        med = statistics.median(vals)
        per = "/".join(f"{v:.2f}" for v in vals)
        print(f"| {k} | {med:.2f} | {per} |")
    print()
    print("run totals: " + " / ".join(f"{t:.1f}" for t in totals) + " s "
          f"over {len(keys)} keys")


if __name__ == "__main__":
    main()
