"""Round-6 optimization side-bench (``bench.py`` is FROZEN for driver
measurement; extra instrumentation lives here per the optimization
round rules).

Per-query isolation with the same timing protocol as ``bench.py``
(best-of-N warm ``.count()``), optional noop-sink full-materialization
timing (guide §1.4), and ``.explain("formatted")`` capture for the
plans/r06 deliverables.

Usage:
    python bench_extra.py [--sf DIR] [--cpus N] [--passes N]
        [--noop] [--explain-dir plans/r06] [--suffix before|after]
        [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all timed)")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write (materializes every column)")
    ap.add_argument("--no-time", action="store_true",
                    help="plan capture only — skip the timed passes")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from sitemapper_spark import queries as qlib
    from sitemapper_spark.probes import probe_pair
    from sitemapper_spark.session import get_spark

    spark = get_spark(
        "sitemapper_bench_extra", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    registry = qlib.all_queries()
    names = args.queries or [
        "tpch_q1", "tpch_q3_like", "frontier_topk_per_host", "seen_anti_join",
        "adjacency_collect", "extract_explode", "events_hourly", "dedup_exact",
        "dedup_normalized", "token_count", "ann_cosine_topk",
        "minhash_near_dup", "simhash_dup_pairs", "srp_near_dup_prod",
        "ivf_ann_topk", "image_near_dup",
    ]
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            suffix = f"_{args.suffix}" if args.suffix else ""
            path = os.path.join(args.explain_dir, f"{name}{suffix}.txt")
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as f:
                f.write(plan)
        if args.no_time:
            out[name] = {"plan_only": True}
            continue
        rec: dict = {}
        p0 = probe_pair()
        samples = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            samples.append(round(time.perf_counter() - t0, 3))
        rec["count_samples"] = samples
        rec["count_best"] = min(samples)
        if args.noop:
            noop_samples = []
            for _ in range(args.passes):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}:noop")
                t0 = time.perf_counter()
                (fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                noop_samples.append(round(time.perf_counter() - t0, 3))
            rec["noop_samples"] = noop_samples
            rec["noop_best"] = min(noop_samples)
        rec["probes"] = [p0, probe_pair()]
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"[extra] {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "results": out}))


if __name__ == "__main__":
    main()
