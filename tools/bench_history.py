#!/usr/bin/env python3
"""Per-round bench ledger: append graft.Bench results to
bench_history.jsonl and print per-query trends, so regression
adjudication is a diff instead of archaeology across BENCH_r0*.json
truncated tails.

Usage:
  bench_history.py append <label> <bench_stdout_file>
      Extract the Bench JSON line and append one JSONL row per query.
  bench_history.py backfill
      Parse every BENCH_r0*.json in the repo root (driver-stored,
      possibly truncated tails) and append whatever per-query numbers
      survive, labeled rN. Skips (label, query) pairs already present.
  bench_history.py trend [query ...]
      Print a label × query table (all queries if none given).

Rows: {"label": str, "query": str, "sec": float,
       "loadavg_before": float|None, "loadavg_after": float|None}
"""
import glob
import json
import os
import re
import sys

HIST = os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl")


def read_hist():
    if not os.path.exists(HIST):
        return []
    with open(HIST) as f:
        return [json.loads(l) for l in f if l.strip()]


def append_rows(rows):
    existing = {(r["label"], r["query"]) for r in read_hist()}
    fresh = [r for r in rows if (r["label"], r["query"]) not in existing]
    with open(HIST, "a") as f:
        for r in fresh:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    print(f"appended {len(fresh)} rows ({len(rows) - len(fresh)} already present)")


def bench_json(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def cmd_append(label, path):
    d = bench_json(path)
    cpu, run = d.get("cpu", {}), d.get("run", {})
    spill, shuf = d.get("spill_disk", {}), d.get("shuffle_write", {})
    rows = []
    for q, s in d["queries"].items():
        row = {"label": label, "query": q, "sec": s,
               "loadavg_before": d.get("loadavg_before"),
               "loadavg_after": d.get("loadavg_after")}
        # executor metrics of the min-wall run (Bench round 8+)
        if q in cpu:
            row["cpu_s"] = cpu[q]
        if q in run:
            row["run_s"] = run[q]
        # spill/shuffle bytes of the min-wall run (non-zero only)
        if q in spill:
            row["spill_disk"] = spill[q]
        if q in shuf:
            row["shuffle_write"] = shuf[q]
        rows.append(row)
    append_rows(rows)


def cmd_backfill():
    rows = []
    for path in sorted(glob.glob(os.path.join(os.path.dirname(HIST), "BENCH_r0*.json"))):
        label = re.search(r"BENCH_(r\d+)", path).group(1)
        # The driver stores the bench line embedded as an escaped JSON
        # string ("tail"), so quotes arrive as \" — normalize first.
        blob = open(path).read().replace('\\"', '"')
        la = re.search(r'"loadavg_before":([0-9.\-]+)', blob)
        lb = re.search(r'"loadavg_after":([0-9.\-]+)', blob)
        for q, s in re.findall(r'"(q[0-9a-z_]+)":([0-9.]+)', blob):
            rows.append({"label": label, "query": q, "sec": float(s),
                         "loadavg_before": float(la.group(1)) if la else None,
                         "loadavg_after": float(lb.group(1)) if lb else None})
    append_rows(rows)


def cmd_trend(queries):
    hist = read_hist()
    if not hist:
        raise SystemExit("no history")
    labels = sorted({r["label"] for r in hist})
    byq = {}
    for r in hist:
        byq.setdefault(r["query"], {})[r["label"]] = r["sec"]
    names = queries or sorted(byq)
    print("query".ljust(34) + "".join(l.rjust(9) for l in labels))
    for n in names:
        cells = [f"{byq.get(n, {}).get(l):.2f}" if byq.get(n, {}).get(l) is not None
                 else "-" for l in labels]
        print(n.ljust(34) + "".join(c.rjust(9) for c in cells))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "trend"
    if cmd == "append":
        cmd_append(sys.argv[2], sys.argv[3])
    elif cmd == "backfill":
        cmd_backfill()
    elif cmd == "trend":
        cmd_trend(sys.argv[2:])
    else:
        raise SystemExit(__doc__)
