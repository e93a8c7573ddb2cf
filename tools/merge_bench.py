#!/usr/bin/env python3
"""Merge N full-bench JSON artifacts into the min-of-3 artifact of
record (round-11 instrument protocol): per-query min across isolated
runs, total = sum of mins, stream_start = min across runs (already
netted per-run from streaming entries).

Usage: merge_bench.py OUT RUN1 RUN2 [RUN3 ...]
"""
import json
import sys


def main() -> None:
    out, *runs = sys.argv[1:]
    datas = [json.load(open(r)) for r in runs]
    names = set(datas[0]["queries"])
    for d in datas[1:]:
        assert set(d["queries"]) == names, "query sets differ across runs"
    assert all(d["failed"] == 0 for d in datas), "a run had failures"
    merged = {k: round(min(d["queries"][k] for d in datas), 2)
              for k in sorted(names)}
    total = round(sum(merged.values()), 2)
    doc = {
        "metric": "total", "value": total, "unit": "sec",
        "n_queries": len(merged), "failed": 0,
        "stream_start": min(d["stream_start"] for d in datas),
        "queries": merged, "sf": datas[0]["sf"],
        "note": ("min-of-%d idle-box merge (round-13 optimization "
                 "protocol): per-query min across isolated runs; "
                 "singles: %s")
                % (len(datas),
                   ", ".join("%.2f" % d["value"] for d in datas)),
    }
    with open(out, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
        f.write("\n")
    print(f"merged {len(runs)} runs -> {out}: total {total}s "
          f"(singles: {[d['value'] for d in datas]})")


if __name__ == "__main__":
    main()
