"""Training-data pipeline operators beyond dedup/similarity: the corpus-
preparation steps between "cleaned documents" and "batches on GPUs".

All deterministic (content/md5-derived randomness — stable across runs,
engines, partitionings and cluster sizes, unlike `df.sample`), all
JVM-side except the sequential-by-nature packing kernel.

- stratified_sample: per-language keep rates (downsample the dominant
  language) on the md5 trick `deterministic_sample` introduced.
- shuffle_order:     seeded global permutation for training order.
- vocab_topk:        corpus token vocabulary with counts (tokenizer
                     vocabulary building / frequency cutoffs).
- decontaminate:     n-gram overlap of every corpus doc against a
                     benchmark/probe set — the eval-contamination check.
- pack_sequences:    greedy token packing into fixed-budget sequences
                     (sample packing), partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..plans.materialize import register_side_cache

# Per-language keep rates as first-md5-byte hex cutoffs: en is dominant
# in the corpus → 25%; the rest keep 75%. ("ff" would be ~100%.)
LANG_CUTOFFS = {"en": "40", "de": "c0", "es": "c0", "fr": "c0", "zh": "c0"}
DEFAULT_CUTOFF = "c0"

SHUFFLE_SEED = "seed42"
VOCAB_K = 100
PROBE_MAX_DOC_ID = 20  # docs with id < 20 act as the "benchmark" set
CONTAM_THRESHOLD = 0.5
PACK_BUDGET = 256  # tokens per packed sequence
PACK_BUCKETS = 8


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling: keep a doc when its content
    md5 falls below its language's cutoff. One map-side filter — at
    100 TB this pipelines with the scan, no shuffle, and the sample is
    reproducible under any repartitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    cutoff = F.lit(DEFAULT_CUTOFF)
    for lang, cut in LANG_CUTOFFS.items():
        cutoff = F.when(F.col("lang") == lang, F.lit(cut)).otherwise(cutoff)
    return docs.filter(bucket < cutoff).select(
        "doc_id", "lang", "source", bucket.alias("sample_bucket")
    )


def shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle: a deterministic training-order permutation
    (rank by md5(seed || doc_id), doc_id tiebreak for hash collisions).

    The window here is global — right for the gold/serving grain it
    serves. At 100 TB emit the sort KEY map-side (shuffle_key below) and
    let the training loader `repartitionByRange(shuffle_key)` +
    `sortWithinPartitions` — same permutation, no single-reducer rank.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit(SHUFFLE_SEED + ":"), F.col("doc_id").cast("string")).cast("binary")
    )
    w = Window.orderBy(key.asc(), F.col("doc_id").asc())
    return docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.row_number().over(w).cast("long").alias("shuffle_rank"),
    )


def vocab_topk(spark: SparkSession, sf_dir: str, k: int = VOCAB_K) -> DataFrame:
    """Top-k corpus vocabulary by token frequency (count desc, token asc
    tiebreak). explode → groupBy token keeps map-side partials; the top-k
    itself is orderBy+limit — Spark's TakeOrderedAndProject, a distributed
    per-partition top-k merged on the driver side of the exchange, NOT a
    global window over the full distinct-token aggregate (tens of millions
    of rows through one window partition at 100 TB — VERDICT r2 #5). The
    residual rank window runs over the already-limited k rows only.

    r14: the count table rides the shared `source_token_counts` fold
    (`corpus_token_counts`) instead of its own scan+explode+aggregate —
    identical (token, n) rows (same tokenization, grouped one level
    finer then summed), and the catalog pass tokenizes the corpus once
    for this, the LM family, and the distributional profiles together.
    """
    from .sketch import corpus_token_counts

    counts = corpus_token_counts(spark, sf_dir)
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return top.select(
        "token", "n", F.row_number().over(w).cast("long").alias("rank")
    )


VOCAB_CHECKPOINT = 1000  # Heaps-law curve sampled every N tokens


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-growth (Heaps-law) curve: distinct tokens
    seen after every `VOCAB_CHECKPOINT` tokens of the source, reading
    tokens in deterministic (doc_id, position) order. A flattening curve
    says the source's vocabulary is saturating — more of it adds tokens
    but not words; a curve that keeps climbing marks open-vocabulary
    content (code, IDs, noise). The curve a data-mix owner reads next to
    `source_kl_divergence`.

    Plan: one per-source position window (sources partition the window —
    parallel across sources; within a source this is the same sequential
    cumulative shape the IBC running sums use), one groupBy(source,
    token) for first occurrences, then first-positions BUCKET by
    checkpoint and a cumulative sum over the (tiny) bucket counts — the
    inequality "first_pos ≤ checkpoint" becomes an equi-keyed aggregate
    plus a window over n_checkpoints rows, never a range join.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    toks = docs.select(
        "source",
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "pos", "token"
        ),
    )
    w = Window.partitionBy("source").orderBy("doc_id", "pos")
    positioned = toks.select(
        "source", "token", F.row_number().over(w).alias("gpos")
    )
    first = positioned.groupBy("source", "token").agg(
        F.min("gpos").alias("first_pos")
    )
    buckets = first.groupBy(
        "source",
        F.ceil(F.col("first_pos") / VOCAB_CHECKPOINT).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("new_tokens"))
    cum = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return buckets.select(
        "source",
        (F.col("bucket") * VOCAB_CHECKPOINT).cast("long").alias("checkpoint"),
        F.sum("new_tokens").over(cum).cast("long").alias("vocab_size"),
    )


def _shuffle_key() -> F.Column:
    return F.md5(
        F.concat(F.lit(SHUFFLE_SEED + ":"), F.col("doc_id").cast("string")).cast("binary")
    )


def shuffle_order_distributed(
    spark: SparkSession, sf_dir: str, num_partitions: int | None = None
) -> DataFrame:
    """The 100 TB `shuffle_order`: identical permutation, no single-reducer
    window (VERDICT r2 #5 minor / task 7).

    Plan: emit the md5 sort key map-side → `repartitionByRange(key, doc_id)`
    (globally ordered, non-overlapping ranges) → `sortWithinPartitions` →
    two-pass global rank the way RDD zipWithIndex does it: pass 1 is a tiny
    per-partition count aggregate (#partitions rows reach the driver, by
    contract), pass 2 adds partition offset + local ordinal in an Arrow
    `mapInPandas` that never materializes a partition. localCheckpoint pins
    the range partitioning so both passes see the same layout.
    """
    import pandas as pd  # noqa: F401 — mapInPandas batch type

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", _shuffle_key().alias("shuffle_key"))
    ranged = (
        keyed.repartitionByRange(num_partitions, "shuffle_key", "doc_id")
        .sortWithinPartitions("shuffle_key", "doc_id")
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    def assign(iterator):
        from pyspark import TaskContext

        start = offsets[TaskContext.get().partitionId()]
        seen = 0
        for pdf in iterator:
            out = pdf.copy()
            out["shuffle_rank"] = range(start + seen + 1, start + seen + len(pdf) + 1)
            seen += len(pdf)
            yield out

    return ranged.mapInPandas(assign, "doc_id long, shuffle_key string, shuffle_rank long")


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, the
    fraction of its distinct word-3-gram shingles that appear anywhere
    in the probe (benchmark) set; flag docs over the threshold.

    The probe shingle set is tiny (benchmarks are) → broadcast; the
    overlap count is a map-side broadcast join + one groupBy(doc_id).
    Docs with shingles but zero probe overlap report overlap 0; docs
    with fewer than 3 words have no shingles and are out of scope (both
    engines agree).
    """
    from .dedup import shingle_frame

    # shared compute-once shingle index (plans/materialize.py seam)
    sh = shingle_frame(spark, sf_dir)
    probe_sh = (
        sh.filter(F.col("doc_id") < PROBE_MAX_DOC_ID).select("shingle").distinct()
    )
    corpus_sh = sh.filter(F.col("doc_id") >= PROBE_MAX_DOC_ID)
    sizes = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = (
        corpus_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    frac = F.round(F.col("n_overlap") / F.col("n_shingles"), 4)
    return (
        sizes.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce(frac, F.lit(0.0)).alias("overlap_frac"),
        )
        .withColumn("contaminated", F.col("overlap_frac") >= CONTAM_THRESHOLD)
    )


def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transpose of `decontaminate`: per PROBE (benchmark) document,
    how exposed it is in the training corpus — the report an eval owner
    reads ("which of MY benchmark items leak, and how widely") while
    `decontaminate` answers the corpus owner's question ("which training
    docs must go"). One row per probe doc: its distinct shingle count,
    how many of those shingles appear anywhere in the corpus, the leaked
    fraction, and how many distinct corpus docs share ≥1 shingle.

    Plan: both sides come from the shared shingle seam; the probe side
    is tiny → broadcast into the join, so the corpus index is probed
    map-side and only (probe_doc, corpus_doc, shingle) hits shuffle into
    the per-probe aggregate. distinct-counts expand to the standard
    two-phase distinct aggregate.
    """
    from .dedup import shingle_frame

    sh = shingle_frame(spark, sf_dir)
    probe = sh.filter(F.col("doc_id") < PROBE_MAX_DOC_ID).select(
        F.col("doc_id").alias("probe_doc_id"), "shingle"
    )
    corpus = sh.filter(F.col("doc_id") >= PROBE_MAX_DOC_ID).select(
        F.col("doc_id").alias("corpus_doc_id"), "shingle"
    )
    sizes = probe.groupBy("probe_doc_id").agg(
        F.count(F.lit(1)).alias("n_probe_shingles")
    )
    hits = corpus.join(F.broadcast(probe), "shingle").groupBy("probe_doc_id").agg(
        F.countDistinct("shingle").alias("n_leaked_shingles"),
        F.countDistinct("corpus_doc_id").alias("n_corpus_docs"),
    )
    return (
        sizes.join(hits, "probe_doc_id", "left")
        .select(
            "probe_doc_id",
            "n_probe_shingles",
            F.coalesce("n_leaked_shingles", F.lit(0)).alias("n_leaked_shingles"),
            F.coalesce(
                F.round(F.col("n_leaked_shingles") / F.col("n_probe_shingles"), 4),
                F.lit(0.0),
            ).alias("leak_frac"),
            F.coalesce("n_corpus_docs", F.lit(0)).alias("n_corpus_docs"),
        )
    )


BLOOM_BITS = 1 << 17  # filter size m in bits (16 KB serialized)
BLOOM_K = 5  # hash functions per element


def decontaminate_bloom(
    spark: SparkSession, sf_dir: str, m_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """`decontaminate` for probe sets too big to broadcast exactly: the
    probe shingles are folded into a fixed-size Bloom filter, so the
    broadcast payload is m/8 bytes REGARDLESS of probe count (the exact
    path broadcasts 8 bytes per distinct probe shingle and stops scaling
    when the probe set outgrows executor memory).

    Built entirely from DataFrame ops (`bloom_filter_agg`/`might_contain`
    are not registered SQL functions in this build): each probe shingle
    sets k = 5 bit positions, positions fold into 64-bit words via a
    `bit_or` groupBy, and the whole filter ships as ONE row holding a
    word-index→word map that the corpus side cross-join-broadcasts and
    probes JVM-side (element_at + bitwise and — no Python, no driver
    collect at any size).

    Bit geometry is md5-derived (r12, VERDICT r11 #5 — rows-only
    retired): ONE md5 per word-3-gram, position i = hex slice
    [6i, 6i+6) (24 bits, and m = 2^17 divides 2^24, so the modulo is
    exactly uniform) — the repo's engine-agnostic hash convention
    (CLAUDE.md), so DuckDB rebuilds the identical positions with
    `('0x' || substring(md5(shingle), 1+6i, 6))::BIGINT % m` and the
    whole filter — false positives INCLUDED — mirrors bit-for-bit.
    The k-position tuple doubles as the shingle identity (distinct on
    it in both engines), so this is a TRUE exact oracle, not a
    modulo-collision-tolerant one. k·6 hex chars must fit the 32-char
    digest (k ≤ 5, asserted).

    One-sided error: a shingle in the probe set ALWAYS hits (recall 1.0 —
    `contaminated` is a superset of the exact path's), a miss can
    false-positive with p ≈ (1 - e^(-k·n/m))^k — at the default m = 2^17,
    k = 5 that is < 1% up to n ≈ 15k probe shingles; size m ≈ 14 bits per
    probe shingle to hold ~1% FPP (the standard Bloom sizing curve).
    Overlap counts are therefore upper bounds; the exact path remains the
    semantic reference, and the oracle certifies the bloom's own
    arithmetic (positions, packing, probe, counts) end to end.
    """
    assert k * 6 <= 32, "k slices of 6 hex chars must fit one md5 digest"
    from ..plans.materialize import materialized_frame

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select("doc_id", F.split("text", " ").alias("w"))
        hx = F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), i -> "
                "md5(cast(concat_ws(' ', w[i], w[i+1], w[i+2]) as binary)))"
            )
        ).alias("hx")
        pos_cols = [
            F.pmod(
                F.conv(F.substring("hx", 1 + 6 * i, 6), 16, 10).cast("long"),
                F.lit(m_bits),
            ).alias(f"p{i}")
            for i in range(k)
        ]
        # distinct on the k-position tuple = the shingle identity both
        # engines share (derived from the same md5 — no cross-engine drift)
        return (
            words.filter(F.size("w") >= 3)
            .select("doc_id", hx)
            .select("doc_id", *pos_cols)
            .distinct()
        )

    # Compute-once position index (plans/materialize.py seam — the md5
    # digest frame replaced the shared xxhash64 shingle seam this used
    # pre-r12, so it carries its own checkpoint to keep warm-pass cost
    # at the joins, not the scan+md5+distinct)
    sh = materialized_frame(
        spark, "bloom_shingle_positions", sf_dir, build, (m_bits, k)
    )
    probe_sh = sh.filter(F.col("doc_id") < PROBE_MAX_DOC_ID)
    corpus_sh = sh.filter(F.col("doc_id") >= PROBE_MAX_DOC_ID)

    # Build: union the probe rows' k positions → word-indexed bit_or →
    # one row carrying the filter as a wi→word map (≤ m/64 entries).
    pos = probe_sh.select(
        F.explode(F.array(*[F.col(f"p{i}") for i in range(k)])).alias("pos")
    )
    words_tbl = (
        pos.selectExpr("pos div 64 AS wi", "CAST(pmod(pos, 64) AS INT) AS bit")
        .groupBy("wi")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("word"))
    )
    bloom = words_tbl.agg(
        F.map_from_arrays(F.collect_list("wi"), F.collect_list("word")).alias("bf")
    )

    # Probe: member iff every one of the k bits is set.
    member = " AND ".join(
        f"(coalesce(element_at(bf, p{i} div 64), 0L)"
        f" & shiftleft(1L, CAST(pmod(p{i}, 64) AS INT))) != 0"
        for i in range(k)
    )
    hits = corpus_sh.join(F.broadcast(bloom)).filter(F.expr(member))

    sizes = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_overlap"))
    frac = F.round(F.col("n_overlap") / F.col("n_shingles"), 4)
    return (
        sizes.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce(frac, F.lit(0.0)).alias("overlap_frac"),
        )
        .withColumn("contaminated", F.col("overlap_frac") >= CONTAM_THRESHOLD)
    )


BPE_N_MERGES = 10


def apply_bpe_expr(col, merges: list[tuple[str, str]]):
    """Column expression applying a merge list to a word's space-joined
    symbol string, chained in merge order — THE single definition of
    merge semantics: the trainer's per-iteration step and the applier
    both call it, so train and apply can never diverge. Boundaries are
    LITERAL single spaces (the symbol delimiter), not \\s — a symbol may
    itself contain a tab/newline (words are split on ' ' alone), and a
    \\s boundary would falsely split such symbols and merge across token
    boundaries. Left-to-right non-overlapping, the reference BPE
    convention. Map-side only; the merge list is a compile-time literal
    (tokenizers ship with the job)."""
    import re as _re

    out = col
    for left, right in merges:
        pat = f"(?<=^| ){_re.escape(left)} {_re.escape(right)}(?= |$)"
        # Java replacement-string escaping: backslash and $ are special
        repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        out = F.regexp_replace(out, pat, repl)
    return out


def _word_symbol_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer state: (space-joined character symbols, word
    count) — vocabulary-sized, built in the pipeline's ONE pass over raw
    text. A materialized seam (registry-owned, eagerly checkpointed):
    the trainer's iterations, the applier, and repeated catalog/bench
    entries all reuse one build per (application, sf_dir)."""
    from ..plans.materialize import materialized_frame

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return (
            docs.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.concat_ws(" ", F.split("w", "")).alias("syms"), "cnt")
        )

    return materialized_frame(spark, "training.bpe_words", sf_dir, build)


# Learned merge lists per (applicationId, realpath(sf_dir), n_merges) —
# the driver-side twin of the frame seam above: training is deterministic
# for a fixed corpus, so `bpe_merges` and `bpe_token_counts` in one
# session share one training run instead of re-learning. Registered with
# the seam registry so `clear_materialized_frames()` invalidates the
# merges TOGETHER with the word frame — a rebuilt frame must never pair
# with stale merges.
_MERGE_CACHE: dict[tuple, list] = register_side_cache({})


def _learned_merges(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    import os

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        n_merges,
    )
    if key not in _MERGE_CACHE:
        _MERGE_CACHE[key] = _bpe_merges_core(
            _word_symbol_frame(spark, sf_dir), n_merges
        )
    return _MERGE_CACHE[key]


def _bpe_merges_core(
    words: DataFrame, n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The greedy merge loop over a prepared word-symbol frame. Leaves
    the caller's `words` frame persisted (callers may keep using it) and
    unpersists every intermediate iteration frame, including the last."""
    merges: list[tuple[int, str, str, str, int]] = []
    cur = words
    for rank in range(n_merges):
        toks = F.split("syms", " ")
        pairs = (
            cur.select(
                F.explode(
                    F.zip_with(
                        toks,
                        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                        lambda a, b: F.concat_ws(" ", a, b),
                    )
                ).alias("pair"),
                "cnt",
            )
            # zip_with pads the shorter side with null -> concat_ws drops
            # it, leaving a pairless trailing token; filter those
            .filter(F.col("pair").contains(" "))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("pair")).first()
        if best is None or best["n"] < 2:
            break
        left, right = best["pair"].split(" ")
        merges.append((rank, left, right, left + right, int(best["n"])))
        nxt = cur.select(
            apply_bpe_expr(F.col("syms"), [(left, right)]).alias("syms"), "cnt"
        ).localCheckpoint(eager=True)
        if cur is not words:
            cur.unpersist()
        cur = nxt
    if cur is not words:
        cur.unpersist()
    return merges


def bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """Tokenizer training: learn the first `n_merges` BPE merges over the
    corpus (Sennrich et al. 2016) — the missing piece between curation
    and training: the tokenizer itself is fit on the corpus this engine
    curates.

    Distributed form: training runs on the WORD-FREQUENCY table, not the
    raw corpus — one pass builds (word -> count) (vocabulary-sized, the
    classic BPE trainer state), then each of the n iterations is (a) an
    adjacent-symbol-pair count weighted by word frequency (map-side
    explode + one small aggregate), (b) a bounded driver argmax (ONE row
    — max count, lexicographic pair as the deterministic tie-break), and
    (c) a map-side merge of the chosen pair via `apply_bpe_expr` (the
    shared merge-semantics definition). The frame is localCheckpointed
    per iteration so lineage doesn't grow with merges — the repo's
    iterative-algorithm idiom (`dedup_clusters` does the same for label
    propagation) — and every iteration frame is unpersisted once
    superseded.

    Scale: the iteration state is O(vocabulary), independent of corpus
    size — 100 TB of text still reduces to one word-count table; pair
    counting and merging never touch raw documents again.

    Rows-only by design (iterative, not SQL-expressible); pinned against
    a reference single-process BPE implementation in test_training.py.
    Returns (merge_rank, left, right, merged, pair_count).
    """
    return spark.createDataFrame(
        _learned_merges(spark, sf_dir, n_merges),
        "merge_rank long, left string, right string, merged string, pair_count long",
    )


def bpe_token_counts(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """The trainer's output CONSUMED: learn the first `n_merges` BPE
    merges, apply them to the corpus, and count the resulting subword
    tokens — the train->tokenize loop end to end, and the frequency table
    a sampler or packing job would read.

    The word-symbol frame is built ONCE and shared by the trainer's
    iterations and the application pass (raw text really is touched
    exactly once across train+apply); the merge list is collected once
    (n rows, bounded by construction) and applied as chained map-side
    regexp replaces. The shared frame stays checkpointed because the
    returned plan reads it lazily. Rows-only (inherits the trainer's
    iterative provenance); application semantics are pinned against the
    reference implementation via the trainer's own test corpus."""
    words = _word_symbol_frame(spark, sf_dir)
    merges = [(m[1], m[2]) for m in _learned_merges(spark, sf_dir, n_merges)]
    applied = words.select(
        apply_bpe_expr(F.col("syms"), merges).alias("syms"), "cnt"
    )
    return (
        applied.select(F.explode(F.split("syms", " ")).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("n"))
    )


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Greedy sequence packing: assign documents to packs of ≤ `budget`
    tokens (sample packing for training efficiency). Packing is
    inherently sequential, so it runs greedily PER BUCKET
    (bucket = doc_id % n_buckets, docs in doc_id order) — deterministic,
    embarrassingly parallel across buckets, and at 100 TB the bucket
    count scales with the cluster while each kernel stays a trivial
    running-sum loop. A doc longer than the budget gets its own pack.

    Oracle-checked: the per-bucket greedy recurrence (row k depends only
    on row k-1's pack ordinal + used budget) is a recursive CTE in DuckDB;
    invariants additionally pinned by tests: exactly-once membership,
    budget respected, order preserved.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long").alias(
            "n_tokens"
        ),
    )
    return pack_sequences_df(docs, budget, n_buckets)


def pack_sequences_df(
    sized: DataFrame,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """`pack_sequences` core over any (doc_id, n_tokens) frame — the
    reusable pipeline stage curated_corpus_v2 runs on its survivors."""
    docs = sized.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )

    def pack(key, pdf):
        (bucket,) = key
        pdf = pdf.sort_values("doc_id")
        pack_ids, local, used = [], 0, 0
        for n in pdf["n_tokens"]:
            if used > 0 and used + n > budget:
                local += 1
                used = 0
            used += int(n)
            pack_ids.append(int(bucket) * 1_000_000 + local)
        out = pdf[["doc_id", "bucket", "n_tokens"]].copy()
        out["pack_id"] = pack_ids
        return out

    return docs.groupBy("bucket").applyInPandas(
        pack, "doc_id long, bucket int, n_tokens long, pack_id long"
    )


def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack utilization of the greedy packing — the table a training
    throughput owner reads before picking a sequence budget: every pad
    token is wasted FLOPs, so fill_frac distribution IS the packing
    quality metric (sample-packing papers report exactly this). One
    grouped integer aggregate over `pack_sequences`' assignment:
    (pack_id, bucket, n_docs, n_tokens, fill_frac) with fill_frac =
    tokens/budget rounded 4 — > 1.0 flags the oversized-single-doc
    packs the greedy rule deliberately gives their own pack.

    Batch-only because the packing assignment it reports on is itself a
    batch fold over a frozen corpus order (pack_sequences' own note);
    re-run on snapshots."""
    packed = pack_sequences(spark, sf_dir)
    return packed.groupBy("pack_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.lit(PACK_BUDGET).cast("double"), 4).alias(
            "fill_frac"
        ),
    )


def training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the pipeline a 100 TB pre-training
    data build actually runs, composed from this repo's own operators:

        quality filter   (adaptive 25th-pct alpha-ratio cutoff)
      → exact dedup      (md5 digest, min-doc_id canonical survives)
      → decontamination  (drop docs n-gram-overlapping the probe set ≥ 50%,
                          and the probe docs themselves)
      → stratified sample(per-language md5 cutoffs)
      → shuffle key      (seeded deterministic training order)

    Output: one row per surviving document with its token count and
    shuffle key — ready for `pack_sequences` / shard writing.

    Scale shape: the quality threshold is ONE tiny global aggregate
    broadcast back; every other step is a doc_id-keyed join or a
    map-side filter — co-partitioned on doc_id end to end, so AQE can
    collapse the join chain into one exchange of O(docs) id rows. The
    only content-sized shuffles are the digest groupBy (16-byte keys)
    and the decontamination shingle probe (broadcast).

    Fully deterministic (md5-derived randomness) → full DuckDB oracle,
    composed from the same SQL fragments as the member operators.
    """
    from ..functions.text import QF_ALPHA_PCT, quality_scores
    from .dedup import dedup_exact_hash

    docs = load_table(spark, sf_dir, "documents")
    # O(docs) × 3 narrow columns, read TWICE (the percentile-threshold
    # aggregate and the gate filter) — checkpoint so the per-doc regex/
    # token scoring scan runs once, not once per consumer.
    scored = quality_scores(spark, sf_dir).select(
        "doc_id", "n_tokens", "alpha_ratio"
    ).localCheckpoint()
    th = scored.agg(
        F.expr(f"percentile(alpha_ratio, {QF_ALPHA_PCT})").alias("alpha_th")
    )
    qual = (
        scored.join(F.broadcast(th))
        .filter(F.col("alpha_ratio") >= F.col("alpha_th"))
        .select("doc_id", "n_tokens")
    )
    canon = dedup_exact_hash(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    contam_bad = decontaminate(spark, sf_dir).filter("contaminated").select("doc_id")

    bucket = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    cutoff = F.lit(DEFAULT_CUTOFF)
    for lang, cut in LANG_CUTOFFS.items():
        cutoff = F.when(F.col("lang") == lang, F.lit(cut)).otherwise(cutoff)

    return (
        docs.filter(F.col("doc_id") >= PROBE_MAX_DOC_ID)
        .filter(bucket < cutoff)
        .join(qual, "doc_id")
        .join(canon, "doc_id")
        .join(contam_bad, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_tokens", _shuffle_key().alias("shuffle_key"))
    )


ORACLE_SQL: dict[str, str] = {
    "stratified_sample": f"""
        SELECT doc_id, lang, source,
               substring(md5(text), 1, 2) AS sample_bucket
        FROM documents
        WHERE substring(md5(text), 1, 2) <
              CASE lang
                  {' '.join(f"WHEN '{lang}' THEN '{cut}'" for lang, cut in LANG_CUTOFFS.items())}
                  ELSE '{DEFAULT_CUTOFF}'
              END
    """,
    "shuffle_order": f"""
        SELECT doc_id,
               md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
               ROW_NUMBER() OVER (
                   ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC) AS shuffle_rank
        FROM documents
    """,
    # same permutation contract as shuffle_order — the distributed plan
    # must be value-identical, so it shares the oracle
    "shuffle_order_distributed": f"""
        SELECT doc_id,
               md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
               ROW_NUMBER() OVER (
                   ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC) AS shuffle_rank
        FROM documents
    """,
    "vocab_topk": f"""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        c AS (
            SELECT token, COUNT(1) AS n FROM t WHERE token <> '' GROUP BY token
        )
        SELECT token, n, rank FROM (
            SELECT token, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank
            FROM c
        ) WHERE rank <= {VOCAB_K}
    """,
    "decontaminate": f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
            FROM w, LATERAL (SELECT unnest(range(1, len(words) - 1)) AS i) t
            WHERE len(words) >= 3
        ),
        probe AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id < {PROBE_MAX_DOC_ID}
        ),
        corpus AS (SELECT * FROM sh WHERE doc_id >= {PROBE_MAX_DOC_ID}),
        sizes AS (
            SELECT doc_id, COUNT(1) AS n_shingles FROM corpus GROUP BY doc_id
        ),
        ov AS (
            SELECT c.doc_id, COUNT(1) AS n_overlap
            FROM corpus c JOIN probe p ON c.shingle = p.shingle
            GROUP BY c.doc_id
        )
        SELECT s.doc_id, s.n_shingles,
               COALESCE(ov.n_overlap, 0) AS n_overlap,
               COALESCE(ROUND(ov.n_overlap / s.n_shingles, 4), 0.0) AS overlap_frac,
               COALESCE(ROUND(ov.n_overlap / s.n_shingles, 4), 0.0) >= {CONTAM_THRESHOLD}
                   AS contaminated
        FROM sizes s LEFT JOIN ov ON s.doc_id = ov.doc_id
    """,
}

# Bit-for-bit mirror of the Bloom path (r12, VERDICT r11 #5): the same
# md5 hex-slice positions, the same distinct-tuple identity, the same
# all-k-bits membership — false positives reproduce identically, so the
# driver hash certifies the filter arithmetic itself.
ORACLE_SQL["decontaminate_bloom"] = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    g AS (
        SELECT doc_id,
               md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS hx
        FROM w, LATERAL (SELECT unnest(range(1, len(words) - 1)) AS i) t
        WHERE len(words) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               {", ".join(
                   f"('0x' || substring(hx, {1 + 6 * i}, 6))::BIGINT"
                   f" % {BLOOM_BITS} AS p{i}"
                   for i in range(BLOOM_K)
               )}
        FROM g
    ),
    bits AS (
        SELECT DISTINCT pos FROM (
            SELECT unnest([{", ".join(f"p{i}" for i in range(BLOOM_K))}]) AS pos
            FROM sh WHERE doc_id < {PROBE_MAX_DOC_ID}
        )
    ),
    corpus AS (SELECT * FROM sh WHERE doc_id >= {PROBE_MAX_DOC_ID}),
    sizes AS (
        SELECT doc_id, COUNT(1) AS n_shingles FROM corpus GROUP BY doc_id
    ),
    ov AS (
        SELECT doc_id, COUNT(1) AS n_overlap
        FROM corpus
        WHERE {" AND ".join(
            f"p{i} IN (SELECT pos FROM bits)" for i in range(BLOOM_K)
        )}
        GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_shingles,
           COALESCE(ov.n_overlap, 0) AS n_overlap,
           COALESCE(ROUND(ov.n_overlap / s.n_shingles, 4), 0.0) AS overlap_frac,
           COALESCE(ROUND(ov.n_overlap / s.n_shingles, 4), 0.0)
               >= {CONTAM_THRESHOLD} AS contaminated
    FROM sizes s LEFT JOIN ov ON s.doc_id = ov.doc_id
"""


def _pack_sql(src_sql: str) -> str:
    """Greedy capacity-reset packing over any (doc_id, n_tokens) source
    SELECT. Packing IS sequential, but per-bucket it is a linear
    recurrence — exactly what a recursive CTE expresses: row k of a
    bucket depends only on row k-1's (pack ordinal, used budget).
    Parameterized so curated_corpus_v2 packs its survivors with the SAME
    rule the standalone entry is certified against."""
    return f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   CAST(doc_id % {PACK_BUCKETS} AS INT) AS bucket,
                   n_tokens,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id % {PACK_BUCKETS} ORDER BY doc_id
                   ) AS rn
            FROM ({src_sql})
        ),
        packed AS (
            SELECT bucket, rn, doc_id, n_tokens,
                   CAST(0 AS BIGINT) AS local_pack, n_tokens AS used
            FROM toks WHERE rn = 1
            UNION ALL
            SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
                   CASE WHEN p.used > 0 AND p.used + t.n_tokens > {PACK_BUDGET}
                        THEN p.local_pack + 1 ELSE p.local_pack END,
                   CASE WHEN p.used > 0 AND p.used + t.n_tokens > {PACK_BUDGET}
                        THEN t.n_tokens ELSE p.used + t.n_tokens END
            FROM toks t JOIN packed p ON t.bucket = p.bucket AND t.rn = p.rn + 1
        )
        SELECT doc_id, bucket, n_tokens,
               CAST(bucket AS BIGINT) * 1000000 + local_pack AS pack_id
        FROM packed
    """


ORACLE_SQL["pack_sequences"] = _pack_sql(
    """SELECT doc_id,
              len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
       FROM documents"""
)

# composed from the packing oracle itself, so the efficiency report can
# never drift from the certified assignment rule
ORACLE_SQL["pack_efficiency"] = f"""
    WITH packing AS ({ORACLE_SQL["pack_sequences"]})
    SELECT pack_id, bucket, COUNT(1) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(SUM(n_tokens) * 1.0 / {PACK_BUDGET}, 4) AS fill_frac
    FROM packing GROUP BY 1, 2
"""


# Composed from the member operators' own oracle fragments (quality_scores
# via functions.text, decontaminate above) so the composite can never
# drift from its parts.
def _training_corpus_oracle() -> str:
    from ..functions.text import ORACLE_SQL as TEXT_ORACLE_SQL
    from ..functions.text import QF_ALPHA_PCT

    lang_case = " ".join(
        f"WHEN '{lang}' THEN '{cut}'" for lang, cut in LANG_CUTOFFS.items()
    )
    return f"""
        WITH scored AS ({TEXT_ORACLE_SQL["quality_scores"]}),
        th AS (SELECT quantile_cont(alpha_ratio, {QF_ALPHA_PCT}) AS alpha_th FROM scored),
        qual AS (
            SELECT doc_id, n_tokens FROM scored, th WHERE alpha_ratio >= alpha_th
        ),
        canon AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        contam AS ({ORACLE_SQL["decontaminate"]}),
        bad AS (SELECT doc_id FROM contam WHERE contaminated)
        SELECT d.doc_id, d.lang, d.source, q.n_tokens,
               md5('{SHUFFLE_SEED}:' || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
        FROM documents d
        JOIN qual q USING (doc_id)
        JOIN canon USING (doc_id)
        WHERE d.doc_id >= {PROBE_MAX_DOC_ID}
          AND d.doc_id NOT IN (SELECT doc_id FROM bad)
          AND substring(md5(d.text), 1, 2) <
              CASE d.lang {lang_case} ELSE '{DEFAULT_CUTOFF}' END
    """


ORACLE_SQL["training_corpus"] = _training_corpus_oracle()


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key: str = "shuffle_key",
) -> dict:
    """Materialize a curated corpus (e.g. `training_corpus` output) as
    `n_shards` globally-ordered parquet shards + a JSON manifest — the
    final hop before a training loader.

    Sharding is `repartitionByRange(key, doc_id)`: shard boundaries are
    non-overlapping key ranges, rows are sorted within each shard, so
    reading shards in manifest order replays the exact seeded shuffle
    permutation. Both properties are deterministic given the data — no
    partition-layout dependence — and the range exchange is the single
    shuffle; at 100 TB `n_shards` scales to thousands and each shard
    writes in parallel.

    The manifest (`_manifest.json`) records per-shard file, row count and
    key range, computed in ONE aggregate pass over the written files
    (grouped on `input_file_name`), plus totals — what a loader needs for
    length-known iteration and resumable epochs. Returns the manifest.
    """
    import json as _json
    import os as _os

    (
        df.repartitionByRange(n_shards, F.col(key), F.col("doc_id"))
        .sortWithinPartitions(key, "doc_id")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    stats = (
        spark.read.parquet(out_dir)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
        )
        .collect()  # bounded: one row per shard by contract
    )
    shards = sorted(
        (
            {
                "file": _os.path.basename(r["file"]),
                "rows": r["rows"],
                "min_key": r["min_key"],
                "max_key": r["max_key"],
            }
            for r in stats
        ),
        key=lambda s: s["min_key"],
    )
    manifest = {
        "n_shards": len(shards),
        "total_rows": sum(s["rows"] for s in shards),
        "order_key": key,
        "shards": shards,
    }
    with open(_os.path.join(out_dir, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=2)
    return manifest


def training_corpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`training_corpus` with the near-duplicate stage added — the
    complete curation chain (quality → exact dedup → NEAR-dup removal →
    decontamination → stratify → shuffle key). Near-dup survivors are
    the connected-component canonicals of the word-3-gram jaccard pair
    graph, computed over the full corpus (a doc's duplicate class does
    not depend on which of its copies pass the other filters); the join
    against the canonical set is one more doc_id-keyed semi-filter in
    the already co-partitioned chain.

    Oracle: the training_corpus SQL composed with the recursive-CTE
    components — again built from the member operators' own fragments.
    """
    from .dedup import dedup_clusters

    base = training_corpus(spark, sf_dir)
    canon = dedup_clusters(spark, sf_dir).filter("is_canonical").select("doc_id")
    return base.join(canon, "doc_id")


def _training_corpus_neardup_oracle() -> str:
    from .dedup import ORACLE_SQL as DEDUP_ORACLE_SQL

    return f"""
        WITH tc AS ({ORACLE_SQL["training_corpus"]}),
        clusters AS ({DEDUP_ORACLE_SQL["dedup_clusters"]}),
        canon AS (SELECT doc_id FROM clusters WHERE is_canonical)
        SELECT tc.* FROM tc JOIN canon USING (doc_id)
    """


ORACLE_SQL["training_corpus_neardup"] = _training_corpus_neardup_oracle()

ORACLE_SQL["vocab_growth"] = f"""
    WITH w AS (
        SELECT source, doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    toks AS (
        SELECT source, doc_id, toks[CAST(i AS BIGINT)] AS token,
               CAST(i AS BIGINT) AS pos
        FROM w, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) t
    ),
    positioned AS (
        SELECT source, token,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY doc_id, pos) AS gpos
        FROM toks
    ),
    first AS (
        SELECT source, token, MIN(gpos) AS first_pos
        FROM positioned GROUP BY source, token
    ),
    buckets AS (
        SELECT source, CAST(ceil(first_pos / {VOCAB_CHECKPOINT}.0) AS BIGINT) AS bucket,
               COUNT(1) AS new_tokens
        FROM first GROUP BY 1, 2
    )
    SELECT source,
           CAST(bucket * {VOCAB_CHECKPOINT} AS BIGINT) AS checkpoint,
           CAST(SUM(new_tokens) OVER (PARTITION BY source ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS vocab_size
    FROM buckets
"""

ORACLE_SQL["contamination_report"] = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
        FROM w, LATERAL (SELECT unnest(range(1, len(words) - 1)) AS i) t
        WHERE len(words) >= 3
    ),
    probe AS (
        SELECT doc_id AS probe_doc_id, shingle FROM sh
        WHERE doc_id < {PROBE_MAX_DOC_ID}
    ),
    corpus AS (
        SELECT doc_id AS corpus_doc_id, shingle FROM sh
        WHERE doc_id >= {PROBE_MAX_DOC_ID}
    ),
    sizes AS (
        SELECT probe_doc_id, COUNT(1) AS n_probe_shingles
        FROM probe GROUP BY probe_doc_id
    ),
    hits AS (
        SELECT p.probe_doc_id,
               COUNT(DISTINCT p.shingle) AS n_leaked_shingles,
               COUNT(DISTINCT c.corpus_doc_id) AS n_corpus_docs
        FROM corpus c JOIN probe p ON c.shingle = p.shingle
        GROUP BY p.probe_doc_id
    )
    SELECT s.probe_doc_id, s.n_probe_shingles,
           COALESCE(h.n_leaked_shingles, 0) AS n_leaked_shingles,
           COALESCE(ROUND(h.n_leaked_shingles / s.n_probe_shingles, 4), 0.0)
               AS leak_frac,
           COALESCE(h.n_corpus_docs, 0) AS n_corpus_docs
    FROM sizes s LEFT JOIN hits h USING (probe_doc_id)
"""
