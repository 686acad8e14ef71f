"""Physical-plan audit: dump .explain('formatted') for the headline
queries and check the plan properties that matter at 100 TB —
predicate pushdown into the parquet scan, column pruning, broadcast
joins for small dimensions, whole-stage codegen coverage, and no
accidental cartesian products.

Usage: python -m bench.explain_audit [--sf-dir DIR] [--out PLANS.md]
Exits non-zero if a required plan property is missing.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


# query -> (must contain, must NOT contain) substrings of the formatted plan
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    # NOTE: .explain("formatted") under AQE does not print WholeStageCodegen
    # spans; the codegen-relevant property it CAN show is the partial (map-
    # side) aggregate before the exchange — check that instead.
    "pricing_summary": (
        ["PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate",
         "HashAggregate", "partial_sum"],
        ["CartesianProduct"],
    ),
    "dim_join_enrich": (
        ["BroadcastHashJoin", "BroadcastExchange"],
        ["SortMergeJoin", "CartesianProduct"],
    ),
    "two_level_rollup": (
        ["HashAggregate"],
        ["CartesianProduct"],
    ),
    "sessionize_events": (
        ["Window", "Sort"],
        ["CartesianProduct"],
    ),
    "lww_latest_event": (
        # the aggregate LWW rewrite: partial_max BEFORE the exchange is
        # the skew lever (window row_number has no partial). Spark plans
        # max(struct) as SortAggregate (struct buffers aren't hash-agg
        # mutable; max_by plans identically) — the partial/final split
        # is what matters, not the agg flavor.
        ["partial_max", "SortAggregate"],
        ["Window", "CartesianProduct"],
    ),
    # one union, both probe halves: the anti side must plan LeftAnti,
    # the semi side LeftSemi with its ship-date filter pushed to scan
    "semi_anti_probe": (
        ["LeftAnti", "LeftSemi",
         "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"],
        ["CartesianProduct"],
    ),
    "dedup_minhash_lsh": (
        ["HashAggregate"],
        ["CartesianProduct"],
    ),
    # brute-force ANN is an intended broadcast nested loop (tiny query
    # side); ArrowEvalPython = the vectorized numpy cosine kernel
    "ann_bruteforce_topk": (
        ["BroadcastNestedLoopJoin", "ArrowEvalPython"],
        [],
    ),
    "ann_ivf_topk": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # ordered per-key assembly: aggregate path (collect_list partials),
    # never a global window sort
    "sequence_assembly": (
        ["ObjectHashAggregate"],
        ["Window", "CartesianProduct"],
    ),
    # mapInPandas fan-out is per-partition: no shuffle anywhere
    "segment_split": (
        ["MapInPandas"],
        ["Exchange", "CartesianProduct"],
    ),
    # blocked embedding dedup: the whole point is the equi-join on the
    # LSH signature — a cartesian product means the blocking key was lost
    "dedup_embedding_blocked": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # IVF dedup end-to-end: candidate generation and rerank are key
    # equi-joins; only the all-pairs baseline may cross-join
    "dedup_embedding_ivf": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "ann_multiprobe_topk": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # guarded train-on-sample IVF: identical search plan to ann_ivf_topk
    "ann_ivf_sampled_topk": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # both multimodal kernels: Arrow fan-out stages, equi-join on doc_id
    "mm_decode_frames": (
        ["MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # two unions of pruned scans, each with its own hash-distinct (a
    # keys-only HashAggregate prints no partial_* function names, so
    # the two-phase split can't be asserted textually here)
    "set_ops_distinct": (
        ["Union", "HashAggregate"],
        ["CartesianProduct"],
    ),
    # batch-bounded streaming aggregate: map-side partial before exchange
    "windowed_domain_counts": (
        ["HashAggregate", "partial"],
        ["CartesianProduct"],
    ),
    # W2's sequential half: ONE shuffle on the key into the grouped-map
    # kernel, never a window sort or a cartesian
    "chained_outlier_rewrite": (
        ["FlatMapGroupsInPandas", "hashpartitioning(user_id"],
        ["Window", "CartesianProduct"],
    ),
    # 4-level cascade: hash aggregates with map-side partials; each
    # level re-aggregates the previous level (no re-scan fan-out would
    # show as 4 separate file scans of events — allowed but the plan
    # must stay cartesian-free and partial-aggregated)
    "rollup_cascade": (
        ["HashAggregate", "partial"],
        ["CartesianProduct"],
    ),
    # role-playing dim: both role joins must broadcast
    "date_dim_roleplay": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
}

# column-pruning check: (query, scan relation substring, pruned ReadSchema)
PRUNING = [
    (
        "pricing_summary",
        "lineitem",
        "l_quantity,l_extendedprice,l_discount,l_returnflag,l_linestatus,l_shipdate",
    ),
    # the fused text profile must stay a single column-pruned scan
    ("text_profile", "documents", "doc_id,text,lang"),
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from etl_spark.queries import load_all
    from etl_spark.session import get_spark

    spark = get_spark("explain_audit", parallelism=4)
    registry = load_all()

    report: list[str] = ["# Physical-plan audit", ""]
    failures: list[str] = []
    for name, (must, must_not) in CHECKS.items():
        plan = formatted_plan(registry[name].fn(spark, args.sf_dir))
        report += [f"## {name}", "", "```", plan.strip(), "```", ""]
        for s in must:
            if s not in plan:
                failures.append(f"{name}: missing required plan fragment {s!r}")
        for s in must_not:
            if s in plan:
                failures.append(f"{name}: forbidden plan fragment {s!r} present")
    for name, rel, cols in PRUNING:
        plan = formatted_plan(registry[name].fn(spark, args.sf_dir))
        want = f"ReadSchema: struct<{cols}"
        if want.replace(",", ":") not in plan.replace(",", ":"):
            # ReadSchema prints types; compare column order loosely
            got = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
            ok = got and all(c.split(":")[0] in got[0] for c in cols.split(","))
            if not ok:
                failures.append(f"{name}: scan of {rel} not pruned to [{cols}]; got {got}")

    # tombstone-read pushdown: the default pages read must push its
    # visibility predicate into the parquet scan (IsNull OR EqualTo —
    # NOT a coalesce, which parquet cannot evaluate on row-group stats).
    import tempfile

    from pyspark.sql import functions as F

    from etl_spark.pipeline import Warehouse, ingest_epoch

    ts_root = tempfile.mkdtemp(prefix="audit_tomb_")
    wh = Warehouse.init(os.path.join(ts_root, "wh"), n_buckets=2)
    ev = spark.createDataFrame(
        [
            (1, 0, "I", "https://a.example/1", "2024-01-01 00:00:00", b"<p>x</p>", None),
            (2, 0, "D", "https://a.example/2", "2024-01-01 00:00:00", None, None),
        ],
        "seq long, epoch long, op string, url string, warc_ts string, html binary, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    ingest_epoch(spark, wh, ev, 0, with_rollup=False, with_lineage=False)
    plan = formatted_plan(wh.pages.read(spark))
    report += ["## tombstone_read_pushdown", "", "```", plan.strip(), "```", ""]
    if "PushedFilters" not in plan or "_deleted" not in plan.split("PushedFilters", 1)[1].split("\n", 1)[0]:
        failures.append(
            "tombstone read: _deleted visibility predicate not pushed to scan"
        )
    import shutil

    shutil.rmtree(ts_root, ignore_errors=True)

    if args.out:
        with open(args.out, "w") as fh:
            fh.write("\n".join(report))
    if failures:
        print("\n".join("FAIL " + f for f in failures))
        sys.exit(1)
    print(f"plan audit OK ({len(CHECKS)} queries)")


if __name__ == "__main__":
    main()
