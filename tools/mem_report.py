#!/usr/bin/env python3
"""Memory-pressure / partition-sensitivity diff of graft.Bench runs.

Usage:
  mem_report.py <label:benchout> <label:benchout> [...]

Each argument is LABEL:PATH where PATH holds a graft.Bench stdout (the
JSON line). Prints a per-query markdown table of wall seconds per run,
plus spill-disk MB where non-zero, ordered by the first run's wall.
Queries missing from a run (failed) print as FAIL.
"""
import json
import sys


def bench_json(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main(argv):
    runs = []
    for a in argv:
        label, path = a.split(":", 1)
        runs.append((label, bench_json(path)))
    base = runs[0][1]
    all_names = sorted({q for _, d in runs for q in d["queries"]} |
                       {q for _, d in runs for q in d.get("failed", [])} |
                       {q for _, d in runs for q in d.get("not_run", [])},
                       key=lambda q: -base["queries"].get(q, 1e9))
    hdr = ["query"] + [f"{l} (s)" for l, _ in runs] + \
        [f"{l} spill (MB)" for l, _ in runs[1:]]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for q in all_names:
        row = [q]
        for _, d in runs:
            if q in d["queries"]:
                row.append(f"{d['queries'][q]:.2f}")
            elif q in d.get("failed", []):
                row.append("FAIL")
            else:
                row.append("—")
        for _, d in runs[1:]:
            sp = d.get("spill_disk", {}).get(q, 0)
            row.append(f"{sp / 1e6:.0f}" if sp else "")
        print("| " + " | ".join(row) + " |")
    print()
    for l, d in runs:
        sp = sum(d.get("spill_disk", {}).values())
        print(f"{l}: total {d['value']:.1f}s, complete={d['complete']}, "
              f"failed={d.get('failed', [])}, spill_disk={sp / 1e6:.0f} MB, "
              f"loadavg {d.get('loadavg_before')}->{d.get('loadavg_after')}")


if __name__ == "__main__":
    main(sys.argv[1:])
