"""Core-count scaling panel (r9 verdict ask #7): warm per-entry timings
at a given core count, on a slice whose tables span MULTIPLE files so the
scan can actually parallelize.

At sf0.1 every table is a single-row-group single-file parquet (scan task
count capped at 1/table by the data — r8 finding #5), so 8-vs-32-core
ratios are ≈1 BY CONSTRUCTION and prove nothing about parallelism. This
tool is meant to run against a multi-file slice from
`tools/make_scale_slice.py --files-per-copy` and with a smaller
maxPartitionBytes, so file splits >> cores and the data-bound entries can
show a real core-scaling ratio.

Usage:
    SPARK_GRAFT_CPUS=8  python tools/bench_cores.py SF_DIR OUT.json [entry ...]
    SPARK_GRAFT_CPUS=32 python tools/bench_cores.py SF_DIR OUT.json [entry ...]

Writes {entry: warm_min_seconds} plus env metadata to OUT.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    # r9 bench top-10 (the slots the verdict asks about)
    "charlm_freq_score",
    "personalized_pagerank_restart",
    "pagerank_supplier_graph",
    "power_iteration_top_eigen",
    "streaming_interval_join_outer",
    "doc_similarity_tf_cosine",
    "star_fact_summary",
    "minhash_estimate_error",
    "boruvka_mst_rounds",
    "dedup_minhash_lsh",
    "recursive_graph_reachability",
    # data-bound controls (scan + shuffle heavy, no iterative floor)
    "q01_pricing_summary",
    "q09_product_profit",
    "curation_funnel",
]


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    names = sys.argv[3:] or DEFAULT_ENTRIES

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark
    from tools.warmup import warm_session

    extra = {
        # let a multi-file table split into many scan tasks even though
        # each file is tens of MB (measurement session only; the bench
        # keeps the session default)
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    }
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-cores"
    spark = get_spark(app_name="bench_cores", extra_conf=extra)
    warm_session(spark, sf_dir)

    def _reclaim():
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    out = {}
    for name in names:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 2))
            _reclaim()
        out[name] = min(runs)
        print(f"{min(runs):7.2f}  {runs}  {name}", file=sys.stderr, flush=True)
    meta = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf_dir": sf_dir,
        "max_partition_bytes": extra["spark.sql.files.maxPartitionBytes"],
        "entries": out,
    }
    with open(out_path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
