"""Sequence segmentation — the §2.9 G5/G7 slot (bounded splitting of a
per-key ordered payload).

The reference splits over-long trajectories into bounded segments
(/root/reference/etl/rollup/sql/staging_split_trajectories.sql:24) and
simplifies them (simplify_trajectories.sql:2). The web-text analog:
split each document's word sequence into bounded chunks (the context-
window packing step of a training-data pipeline). Implemented as an
Arrow-batched mapInPandas kernel — a 1->N fan-out that Spark's built-in
expressions could emulate but a real segmenter (sentence-aware packing,
tokenizer-budgeted chunks) cannot, so the pandas-UDF shape is the
honest one. No shuffle: segmentation is embarrassingly parallel per
input partition; downstream consumers repartition on chunk keys only if
they need to.

Chunk arithmetic is frozen and engine-portable (single-space split,
fixed max_words), so the kernel keeps an exact SQL oracle twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, chunk_text string, n_words int"


def split_words_into_chunks(
    text: str, max_words: int
) -> list[tuple[str, int]]:
    """Pure kernel: split on single spaces (the corpus convention shared
    with the oracles — '' yields one empty word, hence one chunk) and
    regroup into <=max_words (chunk, n_words) pairs. The count comes
    from the slice bounds — re-splitting the joined chunk to count it
    would double the kernel's string work."""
    ws = text.split(" ")
    n = len(ws)
    return [
        (" ".join(ws[i : i + max_words]), min(max_words, n - i))
        for i in range(0, n, max_words)
    ]


def segment_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 64,
) -> DataFrame:
    """doc -> exploded bounded chunks via mapInPandas (Arrow batches in,
    1->N rows out; null/missing text contributes no chunks)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks, counts = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                for i, (chunk, n) in enumerate(
                    split_words_into_chunks(text, max_words)
                ):
                    ids.append(doc_id)
                    idxs.append(i)
                    chunks.append(chunk)
                    counts.append(n)
            yield pd.DataFrame(
                {
                    # nullable Int64: a null doc_id (the schema allows it)
                    # must pass through as SQL null like the oracle does,
                    # not raise from a non-nullable int64 cast
                    "doc_id": pd.array(ids, dtype="Int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "chunk_text": pd.Series(chunks, dtype="object"),
                    "n_words": pd.Series(counts, dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(gen, CHUNK_SCHEMA)
