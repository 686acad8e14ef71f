"""Document-level deduplication operators — the training-data-pipeline
family: exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

All operators take a DataFrame with an id column and a text column and
return pair/group DataFrames. Scale design notes per operator; nothing
here collects to the driver, and every join is an equi-join so Catalyst
/ AQE pick broadcast vs shuffle by size.

Portability: hashes are md5 (identical in Spark, DuckDB, and Python's
hashlib), so each operator has an exact SQL oracle twin in
etl_spark/queries/dedup_docs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.functions.text import content_fingerprint, word_shingles, words

# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on the normalized-content fingerprint.
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content hash: canonical id (min), copy count.
    At 100 TB this is one partial-aggregated shuffle of (hash, id) —
    the text never moves.

    Null text is excluded: content_fingerprint(null) is null, and a
    null-hash group would declare every failed-extraction document a
    "duplicate" of one canonical id — a consumer keeping one doc per
    group would then delete unrelated documents."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            content_fingerprint(F.col(text_col)).alias("content_md5"),
            F.col(id_col),
        )
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard: shingle -> equi-join on shingle -> pair intersection
# counts -> |A∩B| / (|A|+|B|−|A∩B|). The equi-join-instead-of-theta-join
# trick is the same move that replaced the reference's spatial theta join
# (SURVEY.md J6: compute the grid cell, then equi-join).
# ---------------------------------------------------------------------------


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """(id, shingle) exploded + per-doc distinct-shingle count.

    Exact-semantics form: per-doc DISTINCT shingles, dedup'd locally
    inside the array (no shuffle), n_grams carried on every row. Use
    for small inputs (LSH verify candidates) where the carried distinct
    count feeds a Jaccard denominator. The array is built with
    F.transform — a lambda higher-order function, which Catalyst
    evaluates INTERPRETED (CodegenFallback), ~7x slower per shingle
    than `shingle_rows` below — so the full-corpus hot paths use that
    instead (measured 2.9s vs 0.4s over sf0.1, 2026-08-18)."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), k).alias("grams"),
    )
    return sh.select("doc", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram"))


def _split_for_cores(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster's cores when the scan
    has fewer partitions (a small parquet file arrives as ONE split, so
    the whole explode+digest map stage would run single-threaded —
    maxPartitionBytes only splits large files, and AQE only coalesces,
    never widens a map stage). At corpus scale the scan already has
    >= cores partitions and this is a no-op — the guard matters: an
    unconditional repartition would shuffle the full text payload."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """(doc, gram) — one row per shingle POSITION (within-doc duplicates
    possible). The full-corpus hot path: explode the integer positions
    first, then assemble each shingle with codegen'd builtins
    (slice + array_join per output row). Building the whole shingle
    array per doc with F.transform — the obvious form — is interpreted
    per element (lambda higher-order functions are CodegenFallback) and
    measured ~7x slower at sf0.1. Consumers needing per-doc DISTINCT
    shingles (Jaccard df/denominator semantics) add their own
    `.distinct()` (map-side-combined); MinHash min() aggregates are
    duplicate-insensitive and use these rows directly.

    Docs with fewer than k words (or null text) contribute no rows; the
    `when` guard matters because F.sequence(1, 0) would generate a
    DESCENDING sequence, not an empty one."""
    w = words(F.col(text_col))
    n = F.size(w)
    positions = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    pos = _split_for_cores(df).select(
        F.col(id_col).alias("doc"),
        w.alias("_w"),
        F.explode(positions).alias("_i"),
    )
    return pos.select(
        "doc", F.array_join(F.slice("_w", F.col("_i"), k), " ").alias("gram")
    )


# Default stopword-shingle guard: a shingle appearing in more docs than
# this joins quadratically (df^2 candidate rows per shingle), so the
# default is ON — the unguarded form is a latent blow-up at corpus
# scale. 1000 keeps any one shingle's contribution <= ~10^6 join rows
# while being far above the doc-frequency of any discriminative shingle.
DEFAULT_MAX_DOC_FREQ = 1000


def dropped_shingle_stats(
    df: DataFrame, id_col: str, text_col: str, k: int, max_doc_freq: int
) -> dict:
    """How much the doc-frequency cap drops (call this next to
    ngram_jaccard_pairs when you need the truncation surfaced — no
    silent caps). One small aggregation job; result rows are bounded
    (2 rows) so the collect is driver-safe."""
    freq = (
        shingle_rows(df, id_col, text_col, k)
        .distinct()  # df counts DOCS per gram, not positions
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    row = freq.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("df") > max_doc_freq, 1)).alias("dropped"),
        F.max("df").alias("max_df"),
    ).first()
    return {
        "total_shingles": row.total,
        "dropped_shingles": row.dropped,
        "max_doc_freq_seen": row.max_df,
        "cap": max_doc_freq,
    }


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.8,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """All (a < b) pairs with shingle-Jaccard >= threshold.

    Scale levers: ``max_doc_freq`` drops shingles shared by more than N
    docs (stopword shingles explode the join quadratically at corpus
    scale). DEFAULT ON — pass None explicitly for the exact unguarded
    form, and use ``dropped_shingle_stats`` to report what the cap
    removed. When the cap is on, the Jaccard is computed over the
    CAPPED shingle universe on BOTH sides of the fraction: per-doc
    counts are recounted from the surviving shingles, so two identical
    docs still score 1.0 even when some of their shingles are over-cap
    boilerplate. (Using the pre-cap counts in the denominator while the
    intersection can only see survivors systematically underestimates
    similarity — same-site header/footer boilerplate would silently
    push true near-dups below threshold.) The join itself is equi on
    the shingle — residual skew from sub-cap popular shingles is the
    hot-key case AQE skew-join handles.
    """
    # position-exploded fast path + one map-side-combined distinct: the
    # per-doc dedup the old array form did locally (interpreted, ~7x
    # slower per shingle) becomes a hash-distinct on (doc, gram). This
    # path shuffles the exploded table for freq/self-join anyway, so
    # the distinct adds a combiner pass, not a new scale hazard — and
    # this operator is the exact yardstick; minhash is the scale path.
    grams = shingle_rows(df, id_col, text_col, k).distinct()
    if max_doc_freq is not None:
        freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        grams = grams.join(
            freq.filter(F.col("df") <= max_doc_freq).select("gram"), "gram"
        )
        # Materialize the survivors once: three consumers below (counts
        # + both self-join sides) would otherwise each re-explode the
        # corpus and re-run the frequency join. Eager localCheckpoint
        # blocks are GC-reclaimed (see minhash_lsh_pairs' note); at full
        # corpus scale this intermediate belongs in a staging table —
        # this operator is the exact yardstick, minhash is the scale
        # path.
        grams = grams.localCheckpoint(eager=True)
    # per-doc counts over the (possibly capped) universe — pair-level
    # join below touches only pair rows, never the gram table again
    counts = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("doc").alias("a_id"), "gram")
    b = grams.select(F.col("doc").alias("b_id"), "gram")
    common = (
        a.join(b, "gram")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    common = common.join(
        counts.select(F.col("doc").alias("a_id"), F.col("n").alias("a_n")), "a_id"
    ).join(
        counts.select(F.col("doc").alias("b_id"), F.col("n").alias("b_n")), "b_id"
    )
    jac = F.col("n_common") / (F.col("a_n") + F.col("b_n") - F.col("n_common"))
    return (
        common.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("a_id", "b_id", "n_common", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding. Permutations are SLICES of salted md5s: one md5
# per 4 permutations (md5 bytes are independent, so four 32-bit slices
# of one digest are four independent uniform rankings) — 4 md5 calls
# per exploded shingle instead of 16, the dominant cost of the whole
# LSH path. Hex slices are fixed-width lowercase, so string MIN equals
# numeric MIN of the unsigned 32-bit value, and the arithmetic is
# portable (md5 + substr are identical in Spark, DuckDB, hashlib).
# Signatures come from the *exploded* shingle table via 16 min
# aggregates — map-side partials, no per-doc array state, so a hot doc
# (millions of shingles) still reduces incrementally.
# ---------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # 4 rows per band
_PERMS_PER_MD5 = 4  # 4 x 8 hex chars = one 32-hex md5 digest


def minhash_slice(i: int) -> tuple[int, int]:
    """Permutation i reads md5(block || '|' || gram)[pos : pos+8]."""
    return i // _PERMS_PER_MD5, 1 + (i % _PERMS_PER_MD5) * 8


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """(doc, mh0..mh15):
    minhash_i = min(substr(md5(block_i || '|' || gram), pos_i, 8)).

    Built from `shingle_rows` (position-exploded, duplicates possible):
    min() is duplicate-insensitive, so the cheap non-distinct form gives
    bit-identical signatures while skipping both the interpreted
    per-doc array build and any dedup shuffle.

    The slices are materialized in a PROJECTION before the groupBy:
    whole-stage codegen's subexpression elimination shares each digest
    across its four substrings there, so every row pays 4 md5s. Putting
    substr(md5(..)) directly inside the 16 min() children instead
    re-evaluates the digest per aggregate — measured ~45% slower at
    sf0.1 (aggregate child expressions don't CSE across aggregates)."""
    grams = shingle_rows(df, id_col, text_col, k)
    slices = []
    for i in range(N_HASHES):
        block, pos = minhash_slice(i)
        digest = F.md5(F.concat(F.lit(f"{block}|"), F.col("gram")))
        slices.append(F.substring(digest, pos, 8).alias(f"s{i}"))
    proj = grams.select("doc", *slices)
    return proj.groupBy("doc").agg(
        *[F.min(f"s{i}").alias(f"mh{i}") for i in range(N_HASHES)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs from band-bucket collisions, then exact-Jaccard
    verified (candidates only — the expensive join never sees docs that
    no band put together).

    Banding math: P(candidate) = 1-(1-s^4)^4 — s=0.8 -> 0.87,
    s=0.95 -> 0.98; the verify step makes precision exact, recall is
    the LSH trade (the oracle twin replicates the identical banding, so
    the comparison is exact)."""
    sigs = minhash_signatures(df, id_col, text_col, k)
    rows_per_band = N_HASHES // N_BANDS
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "#", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("sig"),
        )
        for b in range(N_BANDS)
    ]
    banded = sigs.select(
        "doc", F.explode(F.array(*band_cols)).alias("bs")
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    # Materialize the banded table ONCE before the self-join: both join
    # sides share its lineage but not its computation — without this the
    # whole shingle -> signature chain (the expensive part) executes
    # twice. banded is 4 rows/doc (proportional to doc count, never to
    # shingle count), so the checkpoint stays small at corpus scale;
    # eager localCheckpoint blocks are GC-reclaimed like cands' below.
    banded = banded.localCheckpoint(eager=True)
    a = banded.select(F.col("doc").alias("a_id"), "band", "sig")
    b = banded.select(F.col("doc").alias("b_id"), "band", "sig")
    # cands feeds two consumers (the id semi-join below and the verify
    # join); materialize it ONCE with an eager localCheckpoint — it is
    # tiny (pair ids only) and this stops Spark re-evaluating the whole
    # shingle->signature->band chain per consumer. localCheckpoint, not
    # persist(): its blocks are reclaimed by the ContextCleaner as soon
    # as the returned DataFrame is garbage collected, so repeated calls
    # (bench iterations, long sessions) don't pin dead cache entries
    # that an un-unpersisted .persist() would leak.
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # exact verify on candidates only: shingle ONLY the candidate docs
    # (semi-join on the input before exploding) — at corpus scale
    # candidates << corpus, so the verify stage never re-shingles the
    # whole table.
    cand_ids = (
        cands.select(F.col("a_id").alias("cid"))
        .unionByName(cands.select(F.col("b_id").alias("cid")))
        .distinct()
    )
    cand_docs = df.join(
        cand_ids, F.col(id_col) == F.col("cid"), "left_semi"
    )
    grams = shingle_table(cand_docs, id_col, text_col, k)
    ga = grams.select(F.col("doc").alias("a_id"), F.col("n_grams").alias("a_n"), "gram")
    gb = grams.select(F.col("doc").alias("b_id"), F.col("n_grams").alias("b_n"), "gram")
    common = (
        cands.join(ga, "a_id")
        .join(gb, ["b_id", "gram"])
        .groupBy("a_id", "b_id", "a_n", "b_n")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("a_n") + F.col("b_n") - F.col("n_common"))
    return (
        common.filter(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash: 64-bit fingerprint from distinct-token md5 bits; near-dup =
# Hamming distance <= d. Banding into (d+1) chunks guarantees FULL recall
# for distance <= d (pigeonhole: at most d chunks can differ), so the
# banded plan equals the all-pairs oracle exactly.
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
HEX_DIGITS = "0123456789abcdef"


def _bit_of_md5(md5_col: F.Column, j: int) -> F.Column:
    """Bit j (0 = MSB) of an md5 hex string, via portable arithmetic:
    hex digit -> int via strpos, then (d div 2^(3-j%4)) % 2."""
    digit = F.substring(md5_col, 1 + j // 4, 1)
    val = F.instr(F.lit(HEX_DIGITS), digit) - 1
    shift = 2 ** (3 - j % 4)
    return F.floor(val / shift) % 2


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, fp_hi, fp_lo): the 64-bit fingerprint (bit j = 1 iff
    Σ_tokens (±1) > 0) packed as two 32-bit halves carried in BIGINTs —
    fingerprint bit j (0 = first md5 bit) is bit (31 − j) of fp_hi for
    j < 32, bit (63 − j) of fp_lo otherwise. Packed ints instead of an
    array<int>(64) so every downstream step stays codegen'd: banding
    keys come from shifts/masks and Hamming distance is
    bit_count(XOR) — the previous zip_with/aggregate array folds are
    interpreted lambdas (CodegenFallback) and dominated the pair stage.

    Computed from the exploded distinct-token table with 64 sum
    aggregates — partial-combinable, no per-doc state. The ±1
    contributions are materialized in a PROJECTION before the groupBy:
    each md5 hex digit feeds 4 bits, and whole-stage codegen CSEs the
    digit extraction there, while aggregate children never CSE across
    aggregates (the same trap minhash_signatures documents). The input
    is round-robined across cores first: a small parquet scan arrives
    as one split and would run this whole map stage single-threaded."""
    toks = _split_for_cores(df).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    contrib = toks.select(
        "doc",
        *[(_bit_of_md5(F.col("h"), j) * 2 - 1).alias(f"c{j}") for j in range(SIMHASH_BITS)],
    )
    sums = contrib.groupBy("doc").agg(
        *[F.sum(f"c{j}").alias(f"s{j}") for j in range(SIMHASH_BITS)]
    )

    def _half(lo_bit: int) -> F.Column:
        half = F.lit(0).cast("long")
        for r in range(32):
            j = lo_bit + r
            half = half + F.when(
                F.col(f"s{j}") > 0, F.lit(1 << (31 - r)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return half

    return sums.select(
        "doc", _half(0).alias("fp_hi"), _half(32).alias("fp_lo")
    )


def _chunk_sig(width: int, c: int) -> F.Column:
    """Fingerprint bits [c·width, (c+1)·width) as a small integer, read
    from the packed (fp_hi, fp_lo) halves with shifts and masks only —
    all codegen'd. Handles ranges falling in either half or spanning
    the 32-bit seam."""
    start, end = c * width, (c + 1) * width
    mask = (1 << width) - 1
    if end <= 32:
        return F.shiftright(F.col("fp_hi"), 32 - end).bitwiseAND(F.lit(mask))
    if start >= 32:
        return F.shiftright(F.col("fp_lo"), 64 - end).bitwiseAND(F.lit(mask))
    n_lo = end - 32  # bits taken from the top of fp_lo
    hi_part = F.col("fp_hi").bitwiseAND(F.lit((1 << (32 - start)) - 1))
    lo_part = F.shiftright(F.col("fp_lo"), 32 - n_lo)
    return F.shiftleft(hi_part, n_lo).bitwiseOR(lo_part)


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(a < b) pairs with Hamming(simhash) <= max_hamming, via
    (max_hamming+1)-chunk banding + exact verify — full recall by
    pigeonhole (at most max_hamming chunks can contain a differing
    bit), so identical to the quadratic all-pairs answer.

    The banding key is an integer chunk of the packed fingerprint and
    the verify is bit_count(XOR) over two longs per side — the shuffle
    carries 2 longs per doc instead of a 64-element array, and no
    interpreted array fold runs per candidate (the prior
    zip_with/aggregate form dominated wall time on dup-heavy corpora
    where the true pair set itself is large)."""
    fps = simhash_fingerprints(df, id_col, text_col)
    n_chunks = max_hamming + 1
    width = SIMHASH_BITS // n_chunks
    chunk_cols = [
        F.struct(F.lit(c).alias("chunk"), _chunk_sig(width, c).alias("sig"))
        for c in range(n_chunks)
    ]
    banded = fps.select(
        "doc", "fp_hi", "fp_lo", F.explode(F.array(*chunk_cols)).alias("cs")
    ).select(
        "doc", "fp_hi", "fp_lo",
        F.col("cs.chunk").alias("chunk"), F.col("cs.sig").alias("sig"),
    )
    # Materialize once before the self-join: the fingerprint subtree
    # (token explode + 64 sum aggregates over every token — the
    # dominant cost) would otherwise execute once per aliased join side
    # (aliased projections defeat exchange reuse). banded is
    # (max_hamming+1) rows/doc of 4 longs, small at any scale; eager
    # localCheckpoint blocks are GC-reclaimed (same pattern + rationale
    # as minhash_lsh_pairs above).
    banded = banded.localCheckpoint(eager=True)
    a = banded.select(
        F.col("doc").alias("a_id"),
        F.col("fp_hi").alias("a_hi"), F.col("fp_lo").alias("a_lo"),
        "chunk", "sig",
    )
    b = banded.select(
        F.col("doc").alias("b_id"),
        F.col("fp_hi").alias("b_hi"), F.col("fp_lo").alias("b_lo"),
        "chunk", "sig",
    )
    cands = (
        a.join(b, ["chunk", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_hi", "a_lo", "b_hi", "b_lo")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
