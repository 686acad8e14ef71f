"""Property test for the north rule's replay contract: for RANDOM
change logs (random keys, ops, out-of-order timestamps, ts collisions)
and RANDOM contiguous epoch splits, the engine's final visible state
equals the global LWW fold of the event set — i.e. final state is a
pure function of the events, independent of epoch boundaries.

This is the hypothesis-fuzzed generalization of the handwritten split
cases in test_tombstones.py: tombstone retention is exactly what makes
it hold when a delete precedes a late older event across a boundary.

Spark per-example cost is real, so examples are few but each is a
multi-key, multi-epoch, collision-rich log (ts drawn from 3 distinct
values, seq dense) — the regime where arbitration bugs live.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_spark.functions.extract import extract_text_series
from etl_spark.pipeline import Warehouse, ingest_epoch

SCHEMA = (
    "seq long, epoch long, op string, url string, warc_ts string, "
    "html binary, lang string"
)
TS = ["2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00"]
URLS = [f"https://p.example/{i}" for i in range(4)]


def _fold(events):
    """Driver-side global LWW fold (the trivial oracle): per key, the
    max (warc_ts, seq) event wins; op 'D' removes the key."""
    state = {}
    for seq, (op, url, ts) in enumerate(events):
        cur = state.get(url)
        if cur is None or (ts, seq) >= cur[0]:
            state[url] = ((ts, seq), op)
    out = {}
    for url, ((ts, seq), op) in state.items():
        if op != "D":
            body = f"<p>{url} s{seq}</p>".encode()
            out[url] = (ts, extract_text_series_one(body), seq)
    return out


def extract_text_series_one(b: bytes) -> str:
    import pandas as pd

    return extract_text_series(pd.Series([b]))[0]


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.sampled_from(URLS),
        st.sampled_from(TS),
    ),
    min_size=1,
    max_size=14,
)
splits_strategy = st.lists(st.integers(0, 13), max_size=3)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, raw_splits=splits_strategy)
def test_random_log_any_split_matches_global_fold(
    spark, tmp_path_factory, events, raw_splits
):
    bounds = sorted({s for s in raw_splits if 0 < s < len(events)})
    root = tmp_path_factory.mktemp("prop")
    wh = Warehouse.init(str(root / "wh"), n_buckets=2)

    lo = 0
    for e, hi in enumerate(bounds + [len(events)]):
        rows = [
            (
                seq,
                e,
                op,
                url,
                ts,
                None if op == "D" else f"<p>{url} s{seq}</p>".encode(),
                None,
            )
            for seq, (op, url, ts) in list(enumerate(events))[lo:hi]
        ]
        df = spark.createDataFrame(rows, SCHEMA).withColumn(
            "warc_ts", F.to_timestamp("warc_ts")
        )
        ingest_epoch(spark, wh, df, e, with_rollup=False, with_lineage=False)
        lo = hi

    got = {
        r.url: (r.warc_ts.strftime("%Y-%m-%d %H:%M:%S"), r.text, r.seq)
        for r in wh.pages.read(spark).collect()
    }
    assert got == _fold(events)
