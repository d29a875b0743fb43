#!/usr/bin/env python3
"""Merge N graft.Bench JSON outputs into a sentinel record.

Usage: merge_bench_mins.py OUT.json RUN1.json [RUN2.json ...]

Each input is one `graft.Bench` stdout line (the leading `[info] ` sbt
prefix is tolerated). The output holds the per-query MIN across all
runs (each run is itself min-of-two passes), the summed total, all
runs' pass records (so calibration_ms stays auditable), and the union
of errors. This is the min-of-2N sentinel discipline adopted in round
10: steady-state latency, robust to one polluted pass — and the
calibration timings let a reader REJECT a polluted record instead of
reading a phantom regression.
"""
import json
import sys


def load(path):
    s = open(path).read().strip()
    if s.startswith("[info] "):
        s = s.split("[info] ", 1)[1]
    return json.loads(s)


def main():
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [load(p) for p in run_paths]
    keys = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == keys, "runs cover different query sets"
    qs = {k: min(r["queries"][k] for r in runs) for k in keys}
    out = {
        "metric": "total",
        "value": sum(qs.values()),
        "unit": "sec",
        "queries": dict(sorted(qs.items())),
        "errors": [e for r in runs for e in r["errors"]],
        "passes": [p for r in runs for p in r["passes"]],
        "sf": runs[0].get("sf", ""),
        "note": "per-query min across %d full graft.Bench runs "
                "(each min-of-two passes)" % len(runs),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print("%s: %.1f s over %d entries, %d errors"
          % (out_path, out["value"], len(qs), len(out["errors"])))


if __name__ == "__main__":
    main()
