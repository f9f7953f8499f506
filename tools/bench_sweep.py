#!/usr/bin/env python3
"""Crash-resuming wrapper around graft.Bench for memory-pressure sweeps.

graft.Bench isolates per-query failures in-process (a stopped
SparkContext is rebuilt between queries), but an OutOfMemoryError that
reaches Spark's uncaught-exception handler HALTS the JVM (exit 52) —
no in-process recovery exists for that. This wrapper restores run-level
completeness: it launches Bench over a query list, and when the JVM
dies it identifies the in-flight victim from the per-query stderr
ledger, records it as killed, and relaunches with the remainder. The
merged result is one bench-shaped JSON with an extra `jvm_killed` list,
so an undersized-heap point reports every query as completed / failed /
killed instead of voiding the tail of the run.

Usage:
  bench_sweep.py --sf-dir DIR --mem 2g --queries-file tools/scale_queries.txt \
      --out /tmp/bench_sweep_2g [--passes 1] [--max-launches 10]

Writes <out>.launch<N>.{out,err} per JVM and the merged <out>.json.
"""
import argparse
import json
import os
import re
import subprocess
import sys

LINE = re.compile(
    r"^\[bench\] (?:pass|retry)\d+ (\S+) ([\d.]+)s cpu=([\d.]+)s "
    r"run=([\d.]+)s spill=(\d+) shw=(\d+)( FAILED)?")


def loadavg():
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--mem", required=True)
    ap.add_argument("--queries-file", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--passes", default="1")
    ap.add_argument("--max-launches", type=int, default=10)
    args = ap.parse_args()

    with open(args.queries_file) as f:
        remaining = sorted(set(f.read().split()))
    merged = {"queries": {}, "cpu": {}, "run": {},
              "spill_disk": {}, "shuffle_write": {}}
    failed, retried, killed = set(), set(), []
    load_before = loadavg()
    launch = 0
    while remaining and launch < args.max_launches:
        launch += 1
        env = dict(os.environ,
                   SPARK_DRIVER_MEM=args.mem,
                   SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_BENCH_PASSES=args.passes)
        out_p = f"{args.out}.launch{launch}.out"
        err_p = f"{args.out}.launch{launch}.err"
        print(f"[sweep] launch {launch}: {len(remaining)} queries, "
              f"heap {args.mem}", flush=True)
        with open(out_p, "w") as o, open(err_p, "w") as e:
            rc = subprocess.call(
                ["sbt", "-batch", "runMain graft.Bench " + " ".join(remaining)],
                stdout=o, stderr=e, env=env)
        bench = None
        with open(out_p) as f:
            for line in f:
                if line.startswith('{"metric"'):
                    bench = json.loads(line)
                    break
        if bench is not None:
            for k in merged:
                merged[k].update(bench.get(k, {}))
            failed.update(bench.get("failed", []))
            retried.update(bench.get("retried", []))
            break
        # JVM died before the JSON line: reconstruct from the stderr
        # ledger. Queries with an ok line are done. An OutOfMemoryError
        # often surfaces TWICE: the query's job fails (Bench logs a
        # FAILED line and moves on) and Spark's uncaught-exception
        # handler halts the JVM asynchronously moments later — so when
        # any FAILED line exists, the death is attributed to those
        # queries (recorded failed, dropped from the relaunch), NOT to
        # the first unattempted query. Only a death with a clean ledger
        # marks the first unseen query as the in-flight victim.
        # Either way each crashed launch removes ≥1 query → terminates.
        ok_runs, seen = {}, set()
        with open(err_p) as f:
            for line in f:
                m = LINE.match(line)
                if not m:
                    continue
                name, wall, cpu, run, spill, shw, fail = m.groups()
                seen.add(name)
                if fail is None and (name not in ok_runs
                                     or float(wall) < ok_runs[name][0]):
                    ok_runs[name] = (float(wall), float(cpu), float(run),
                                     int(spill), int(shw))
        for name, (wall, cpu, run, spill, shw) in ok_runs.items():
            merged["queries"][name] = wall
            merged["cpu"][name] = cpu
            merged["run"][name] = run
            if spill:
                merged["spill_disk"][name] = spill
            if shw:
                merged["shuffle_write"][name] = shw
        failed_seen = {q for q in seen if q not in ok_runs}
        unseen = [q for q in remaining if q not in seen]
        victim = None
        if failed_seen:
            print(f"[sweep] launch {launch} JVM died (rc={rc}) after "
                  f"in-process failures {sorted(failed_seen)} — "
                  f"attributing the halt to them, resuming", flush=True)
            failed.update(failed_seen)
        elif unseen:
            victim = unseen[0]
            print(f"[sweep] launch {launch} JVM died (rc={rc}) in-flight "
                  f"on {victim} — marking killed, resuming", flush=True)
            killed.append(victim)
        else:
            print(f"[sweep] launch {launch} JVM died (rc={rc}) with every "
                  f"query accounted for — stopping", flush=True)
        next_remaining = [q for q in unseen if q != victim]
        if next_remaining == remaining:
            break  # no progress; stop rather than loop forever
        remaining = next_remaining
    failed.update(killed)
    # Queries never attempted (max-launches exhausted, or the no-progress
    # break) must not vanish from the merged JSON: list them explicitly
    # so the report renders them as not-run rather than silently omitting
    # them, and they void `complete` like a failure would.
    not_run = sorted(q for q in remaining
                     if q not in merged["queries"] and q not in failed)
    result = {
        "metric": "total", "value": sum(merged["queries"].values()),
        "unit": "sec", "queries": merged["queries"],
        "failed": sorted(failed), "complete": not failed and not not_run,
        "not_run": not_run,
        "retried": sorted(retried), "jvm_killed": killed,
        "launches": launch, "mem": args.mem,
        "loadavg_before": load_before, "loadavg_after": loadavg(),
        "sf": args.sf_dir, "cpu": merged["cpu"], "run": merged["run"],
        "spill_disk": merged["spill_disk"],
        "shuffle_write": merged["shuffle_write"],
    }
    with open(args.out + ".json", "w") as f:
        json.dump(result, f)
    print(f"[sweep] done: {len(merged['queries'])} ok, "
          f"{sorted(failed)} failed (jvm_killed={killed}, not_run={not_run}), "
          f"total {result['value']:.1f}s -> {args.out}.json", flush=True)


if __name__ == "__main__":
    main()
