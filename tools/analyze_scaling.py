"""Consolidate bench_scaling_*.json pass rows into one table.

Every 32-level (and 8-level) pass ever recorded, with steal / busy /
heap / cpu-probe columns where present — the raw material for the
variance discussion in BENCH.md §1.2/§3.2. Pure JSON reading, no
Spark.

Usage: python tools/analyze_scaling.py [glob...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rows(files):
    for fn in files:
        try:
            d = json.load(open(fn))
        except Exception:
            continue
        levels = d.get("levels") or {}
        for lvl, passes in levels.items():
            for p in passes:
                yield {
                    "file": os.path.basename(fn),
                    "n_pages": d.get("n_pages"),
                    "fetch": d.get("fetch"),
                    "level": int(lvl),
                    "run": p.get("run"),
                    "sec": p.get("sec"),
                    "urls_s": p.get("urls_per_sec"),
                    "steal": p.get("steal_pct"),
                    "busy": p.get("busy_pct"),
                    "heap": p.get("heap_gb"),
                    "probe": p.get("cpu_probe_ms"),
                    "bw": p.get("membw_probe_ms"),
                    "cert": p.get("certified"),
                }


def main():
    pats = sys.argv[1:] or [os.path.join(REPO, "bench_scaling_*.json")]
    files = sorted(f for pat in pats for f in glob.glob(pat))
    data = sorted(
        rows(files),
        key=lambda r: (r["n_pages"] or 0, r["level"], r["file"], r["run"]),
    )
    hdr = ("pages", "lvl", "run", "sec", "urls/s", "steal%", "busy%",
           "heap", "probe_ms", "bw_ms", "cert", "file")
    print(("%8s %3s %6s %8s %9s %6s %6s %5s %14s %12s %5s  %s") % hdr)
    for r in data:
        probe = ("%s/%s" % tuple(r["probe"])) if r["probe"] else "-"
        bw = ("%s/%s" % tuple(r["bw"])) if r["bw"] else "-"
        cert = {True: "YES", False: "no", None: "-"}[r["cert"]]
        print("%8s %3d %6s %8s %9s %6s %6s %5s %14s %12s %5s  %s" % (
            r["n_pages"], r["level"], r["run"], r["sec"], r["urls_s"],
            r["steal"], r["busy"], r["heap"] or "-", probe, bw, cert,
            r["file"].replace("bench_scaling_", "")))


if __name__ == "__main__":
    main()
