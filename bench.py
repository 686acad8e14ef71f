"""Benchmark harness — one JSON line on stdout.

Runs (a) the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and (b) the end-to-end CDC ingest throughput
bench (tail -> clean -> dedup -> extract -> MERGE -> commit) on a
deterministically generated change log, on local[$SPARK_GRAFT_CPUS].

Protocol follows the reference's harness discipline
(/root/reference/benchmarks/runners/abstract_benchmark_runner.py:23,
60-66): warm-up run first, then timed iterations, medians reported.

Since round 5 the harness also reports COLD medians with the
reference's full cache discipline
(/root/reference/benchmarks/runners/abstract_benchmark_runner.py:60-93):
before every cold iteration the OS page cache is dropped (root-only;
reported as unavailable otherwise) and 3 rounds of randomized-parameter
"garbage queries" run to evict whatever survives — cold numbers are a
different quantity than warm medians and both are published.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  BENCH_INGEST_EVENTS  change events for the ingest bench (default 8_000_000)
  BENCH_ITERS          timed iterations per query (default 3)
  BENCH_COLD_ITERS     cold iterations per query (default 2; 0 disables)
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import tempfile
import time


HEADLINE_QUERIES = [
    # scan + agg (pushdown, partial aggs)
    "pricing_summary",
    # broadcast join chain
    "dim_join_enrich",
    # window sessionization
    "sessionize_events",
    # skew-resistant LWW dedup
    "lww_latest_event",
    # shingle-join + LSH dedup
    "dedup_minhash_lsh",
    # vector top-k
    "ann_bruteforce_topk",
    # two-level rollup
    "two_level_rollup",
]

# Scale paths tracked since r4 but kept OUT of the headline set (and
# out of `value`) so round-over-round totals stay comparable with
# r1-r3; these get their own timing dict in the JSON.
SECONDARY_QUERIES = [
    # learned-index ANN dedup end to end (index -> probe -> rerank)
    "dedup_embedding_ivf",
    # shuffle-free mapInPandas chunk packing
    "segment_split",
]


def _time_query(fn, spark, sf_dir, iters: int) -> float:
    fn(spark, sf_dir).count()  # warm-up (plans, code-gen, page cache)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _drop_os_cache() -> bool:
    """Reference cache discipline step 1 (clear_cache.sh analog):
    sync + drop the page cache. Root-only; False when unavailable."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        return True
    except OSError:
        return False


def _garbage_queries(spark, sf_dir: str, rng: random.Random, rounds: int = 3):
    """Reference cache discipline step 2: between timed iterations run
    shuffled queries with RANDOMIZED parameters
    (random_garbage_parameters.sql analog) so JVM/e.g. codegen caches
    hold someone else's working set. Seeded rng — the harness stays
    replayable even though the parameters vary per iteration."""
    for _ in range(rounds):
        lo = rng.uniform(0.0, 400000.0)
        day = rng.randint(0, 2000)
        resid = rng.randint(0, 96)
        jobs = [
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(f"o_totalprice BETWEEN {lo} AND {lo + 50000}")
            .groupBy("o_orderstatus")
            .sum("o_totalprice"),
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(f"l_shipdate >= date_add(DATE '1992-01-01', {day})")
            .select("l_quantity", "l_extendedprice"),
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(f"user_id % 97 = {resid}")
            .groupBy("event_type")
            .max("value"),
        ]
        rng.shuffle(jobs)
        for j in jobs:
            j.count()


def _time_query_cold(fn, spark, sf_dir, iters: int, rng: random.Random):
    """Cold medians: garbage rounds FIRST (pollute JVM/exec caches with
    someone else's working set), THEN the page-cache drop, then the
    timed run — in that order, because the garbage queries scan the
    same parquet files the timed query reads; dropping the cache first
    would let them re-warm exactly the pages under measurement. What
    stays warm is plans/codegen — Spark's steady state on a long-lived
    driver; what goes cold is the data path."""
    times, dropped = [], True
    for _ in range(iters):
        _garbage_queries(spark, sf_dir, rng)
        dropped = _drop_os_cache() and dropped
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    return statistics.median(times), dropped


def _one_ingest(spark, n_events: int, n_epochs: int) -> tuple[float, int]:
    from etl_spark.pipeline import Warehouse, ingest_range
    from etl_spark.sources.changelog import changes_at_scale_provider

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    root = tempfile.mkdtemp(prefix="bench_wh_")
    # bucket count sized to keep every core writing (4 buckets/core);
    # on a real cluster this is thousands (see BASELINE.md).
    wh = Warehouse.init(os.path.join(root, "wh"), n_buckets=4 * cpus)
    changes = changes_at_scale_provider(
        spark, n_events, events_per_epoch=n_events // n_epochs + 1
    )
    t0 = time.perf_counter()
    stats = ingest_range(
        spark, wh, changes, range(n_epochs), with_rollup=False, with_lineage=False
    )
    wall = time.perf_counter() - t0
    applied = sum(s.delta_rows for s in stats)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return wall, applied


def run_ingest_bench(spark, n_events: int, n_epochs: int = 2, runs: int = 3) -> dict:
    """End-to-end change-events/sec: generate -> ingest all epochs ->
    atomic commits.

    Same estimator as the queries: one full warm-up run (JIT, Python
    workers, page cache), then ``runs`` timed runs, median reported.
    All samples are committed so a noisy window (this host shows
    multi-minute ambient 2-3x load bursts) is visible in the artifact
    rather than hidden."""
    from etl_spark.session import warm_python_workers

    warm_python_workers(spark)
    warm_wall, _ = _one_ingest(spark, n_events, n_epochs)  # warm-up
    walls, applied = [], 0
    for _ in range(runs):
        wall, applied = _one_ingest(spark, n_events, n_epochs)
        walls.append(wall)
    med = statistics.median(walls)
    return {
        "events": n_events,
        "epochs": n_epochs,
        "merged_keys": applied,
        "wall_s": round(med, 2),
        "wall_s_samples": [round(w, 2) for w in walls],
        "warmup_wall_s": round(warm_wall, 2),
        "estimator": "median_of_%d_after_warmup" % runs,
        "events_per_sec": round(n_events / med, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    # 8M default since r4: the 2M runs were warm-up-dominated (78s
    # warm-up vs 17s steady samples with a 28->17s spread); at 8M
    # steady-state throughput dominates the estimate.
    n_events = int(os.environ.get("BENCH_INGEST_EVENTS", "8000000"))

    from etl_spark.queries import load_all
    from etl_spark.session import get_spark

    spark = get_spark("etl_spark_bench", parallelism=cpus)
    registry = load_all()

    queries: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        queries[name] = round(
            _time_query(registry[name].fn, spark, sf_dir, iters), 3
        )
    secondary: dict[str, float] = {}
    for name in SECONDARY_QUERIES:
        secondary[name] = round(
            _time_query(registry[name].fn, spark, sf_dir, iters), 3
        )

    cold_iters = int(os.environ.get("BENCH_COLD_ITERS", "2"))
    queries_cold: dict[str, float] = {}
    cache_dropped = None
    if cold_iters > 0:
        rng = random.Random(20260818)
        cache_dropped = True
        for name in HEADLINE_QUERIES:
            med, dropped = _time_query_cold(
                registry[name].fn, spark, sf_dir, cold_iters, rng
            )
            queries_cold[name] = round(med, 3)
            cache_dropped = cache_dropped and dropped

    ingest = run_ingest_bench(spark, n_events)
    total = round(sum(queries.values()) + ingest["wall_s"], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline queries + CDC ingest wall-clock",
        "value": total,
        "unit": "sec",
        "queries": queries,
        # tracked scale paths, excluded from `value` for r1-r3
        # comparability
        "secondary_queries": secondary,
        # reference-discipline cold medians (page-cache drop + 3
        # randomized garbage rounds per iteration); a different
        # quantity than the warm medians above, excluded from `value`
        "queries_cold": queries_cold,
        "cold": {
            "iterations": cold_iters,
            "os_cache_dropped": cache_dropped,
            "garbage_rounds": 3,
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "ingest": ingest,
        "cpus": cpus,
        "iterations": iters,
        # per-component: ingest always runs its own fixed run count
        "estimator": {
            "queries": "median_of_%d_after_warmup" % iters,
            "ingest": ingest["estimator"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
