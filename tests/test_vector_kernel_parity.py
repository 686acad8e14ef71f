"""The numpy (Arrow pandas_udf) vector kernels must be BIT-identical to
the JVM fold kernels — same IEEE operation order per dimension — so the
SQL-oracle hash checks hold under either physical plan (the dispatch is
a perf knob, never a semantics knob).
"""

from __future__ import annotations

import pytest

from etl_spark.operators import similarity as sim
from etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def _restore_kernel():
    orig = sim.VECTOR_KERNEL
    yield
    sim.VECTOR_KERNEL = orig


def _with_kernel(kernel, fn):
    sim.VECTOR_KERNEL = kernel
    return fn()


def test_cosine_bit_identical(spark, _restore_kernel):
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings").limit(40)
    a = emb.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").cast("array<double>").alias("a_v"),
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").cast("array<double>").alias("b_v"),
    )

    def run():
        pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
        return sorted(
            (r.a_id, r.b_id, r.c)
            for r in pairs.select(
                "a_id", "b_id",
                sim.cosine_cols(F.col("a_v"), F.col("b_v")).alias("c"),
            ).collect()
        )

    fold = _with_kernel("fold", run)
    npk = _with_kernel("numpy", run)
    assert len(fold) == len(npk) > 0
    for (ia, ib, cf), (ja, jb, cn) in zip(fold, npk):
        assert (ia, ib) == (ja, jb)
        # bit-identical doubles, not approx: same IEEE op order
        assert cf == cn, (ia, ib, cf.hex(), cn.hex())


def test_kmeans_assignments_identical(spark, _restore_kernel):
    emb = load_table(spark, SF, "embeddings")

    def run():
        cells, cents, ids = sim.kmeans_cells(
            emb, "vec_id", "embedding", k=5, iters=2
        )
        return (
            sorted((r.vid, r.cell) for r in cells.collect()),
            cents,
            ids,
        )

    fa, ca, ia = _with_kernel("fold", run)
    fb, cb, ib = _with_kernel("numpy", run)
    assert fa == fb
    assert ia == ib
    assert ca == cb  # centroids bit-identical (fed by identical groups)


def test_ivf_pairs_and_probes_identical(spark, _restore_kernel):
    emb = load_table(spark, SF, "embeddings")

    def run():
        out = sim.ivf_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.95, k=5, n_probes=2
        )
        return sorted(
            (r.a_id, r.b_id, r.cosine) for r in out.collect()
        )

    assert _with_kernel("fold", run) == _with_kernel("numpy", run)
