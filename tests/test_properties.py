"""Property-based tests (hypothesis): operator semantics vs independent
pure-Python references on randomized inputs (SURVEY.md §5 — exceeds the
reference's test strategy, which has no property tests)."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bread_spark.streaming.sessions import SESSION_GAP_MIN, session_stats

EPOCH = datetime.datetime(2024, 1, 1)

# Tiered example budget (r9): each example costs real Spark jobs, so the
# DEFAULT tier runs 2 randomized examples per property and the nightly
# certification pass (BREAD_TEST_NIGHTLY=1) restores the full 5 — the
# properties themselves run in BOTH tiers, only the random-input depth
# differs. Hypothesis seeds fresh examples per run, so successive default
# runs still accumulate coverage over time.
from tests.conftest import NIGHTLY

EXAMPLES = 5 if NIGHTLY else 2

# events per user: gaps in minutes (0..180), values
user_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=180), st.integers(min_value=0, max_value=100)),
    min_size=1,
    max_size=12,
)


def python_sessionize(per_user: dict[int, list[tuple[int, int]]]):
    """Independent reference implementation: dict-of-lists, no Spark."""
    out = {}
    for uid, gaps in per_user.items():
        t = 0
        sid, n, total, start = 0, 0, 0.0, None
        last = None
        for gap_min, value in gaps:
            t += gap_min * 60
            if last is not None and t - last > SESSION_GAP_MIN * 60:
                out[(uid, sid)] = (n, start, last, total)
                sid += 1
                n, total, start = 0, 0.0, t
            if start is None:
                start = t
            n += 1
            total += float(value)
            last = t
        out[(uid, sid)] = (n, start, last, total)
    return out


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(user_events, min_size=1, max_size=4))
def test_sessionize_matches_python_reference(spark, users):
    per_user = {uid: gaps for uid, gaps in enumerate(users)}
    rows = []
    for uid, gaps in per_user.items():
        t = 0
        for gap_min, value in gaps:
            t += gap_min * 60
            rows.append((uid, EPOCH + datetime.timedelta(seconds=t), float(value)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_id"] - 1): (
            r["n_events"],
            int((r["session_start"] - EPOCH).total_seconds()),
            int((r["session_end"] - EPOCH).total_seconds()),
            r["session_value"],
        )
        for r in session_stats(df).collect()
    }
    expected = python_sessionize(per_user)
    assert got == {k: (n, s, e, pytest.approx(v)) for k, (n, s, e, v) in expected.items()}


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=10, max_size=60),
        min_size=2,
        max_size=6,
    )
)
def test_minhash_signature_properties(spark, texts):
    """Identical documents always get identical MinHash signatures, and
    signatures have the configured length with values in [0, p)."""
    from bread_spark.extensions.dedup import MERSENNE, NUM_HASHES, _word_shingles, minhash_signatures

    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), texts[0])]  # clone of doc 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _word_shingles(docs)
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(sh).collect()}
    if 0 in sigs:  # doc 0 had ≥1 shingle
        assert sigs[0] == sigs[len(texts)]
        for sig in sigs.values():
            assert len(sig) == NUM_HASHES
            assert all(0 <= v < MERSENNE for v in sig)


def test_simhash_matches_per_bit_plan(spark, sf_dir):
    """The single-shuffle SimHash (64 conditional sums in one
    groupBy(doc_id)) must produce bit-identical fingerprints to the naive
    per-(doc_id, bit) plan it replaced (VERDICT r2 #4)."""
    from pyspark.sql import functions as F

    from bread_spark.extensions.dedup import simhash_fingerprints
    from bread_spark.io import load_table

    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(spark, sf_dir).collect()}

    # reference: the r2 explode(64 bits) + groupBy(doc_id, bit) plan
    docs = load_table(spark, sf_dir, "documents")
    tok_hash = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", F.xxhash64("tok").alias("h"))
    )
    per_bit = tok_hash.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(64)])).alias("bit"),
        F.col("h"),
    ).select(
        "doc_id",
        "bit",
        F.when(F.expr("shiftright(h, cast(bit as int)) & 1") == 1, 1).otherwise(-1).alias("delta"),
    )
    expected = {
        r["doc_id"]: r["simhash"]
        for r in per_bit.groupBy("doc_id", "bit")
        .agg(F.sum("delta").alias("s"))
        .select(
            "doc_id",
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), cast(bit as int))"))
            .otherwise(F.lit(0).cast("long"))
            .alias("bitval"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
        .collect()
    }
    assert got == expected


def test_simhash_overflow_guard_raises(spark, sf_dir, monkeypatch):
    """A document over the lane-capacity token cap must raise, not emit a
    wrong fingerprint from a saturated counter."""
    import pytest

    from bread_spark.extensions import dedup

    monkeypatch.setattr(dedup, "SIMHASH_MAX_TOKENS", 5)
    with pytest.raises(Exception, match="exceeds 5 tokens"):
        dedup.simhash_fingerprints(spark, sf_dir).collect()


def test_pivot_roundtrip_random_occurrences(spark):
    """EAV → wide pivot → melt returns the original EAV set, including
    repeated (type,key) pairs disambiguated by occurrence (R3/R4)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for tx in range(20):
        for rep in range(rng.randint(1, 3)):
            for key in rng.sample(["amount", "denom", "sender"], rng.randint(1, 3)):
                rows.append((f"H{tx}", 10 + tx, rep, "transfer_" + key, f"v{tx}_{rep}_{key}"))
    eav = spark.createDataFrame(
        rows, "hash string, height long, occurrence long, combined_key string, value string"
    )
    wide = eav.groupBy("hash", "height", "occurrence").pivot("combined_key").agg(F.first("value"))
    melted = wide.selectExpr(
        "hash",
        "height",
        "occurrence",
        "stack(3, 'transfer_amount', transfer_amount, 'transfer_denom', transfer_denom, "
        "'transfer_sender', transfer_sender) as (combined_key, value)",
    ).filter("value IS NOT NULL")
    assert sorted(map(tuple, melted.collect())) == sorted(map(tuple, eav.collect()))


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=15),
    st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=8),
)
def test_asof_join_matches_python_reference(spark, left_offsets, right_offsets):
    """asof_join == bisect-based reference on random timelines (one key;
    per-key isolation is covered by the unit tests)."""
    import bisect

    from bread_spark.operators.asof import asof_join

    right_offsets = sorted(set(right_offsets))
    left_rows = [
        (i, 1, EPOCH + datetime.timedelta(seconds=o)) for i, o in enumerate(left_offsets)
    ]
    right_rows = [
        (1, EPOCH + datetime.timedelta(seconds=o), float(o)) for o in right_offsets
    ]
    left = spark.createDataFrame(left_rows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")

    got = {
        r["lid"]: r["v"] for r in asof_join(left, right, on="ts", by="k").collect()
    }
    for lid, _, ts in left_rows:
        o = (ts - EPOCH).total_seconds()
        idx = bisect.bisect_right(right_offsets, o) - 1
        expected = float(right_offsets[idx]) if idx >= 0 else None
        assert got[lid] == expected, (lid, o, got[lid], expected)

# ---------------------------------------------------------------------------
# Connected components vs union-find reference
# ---------------------------------------------------------------------------

def python_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min node id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n_nodes)}


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=25).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=n - 1),
                    st.integers(min_value=0, max_value=n - 1),
                ).filter(lambda e: e[0] != e[1]),
                max_size=30,
            ),
        )
    )
)
def test_connected_components_matches_union_find(spark, case):
    """Min-label propagation must agree with union-find on arbitrary
    graphs — including long chains (worst case for the diameter-bounded
    loop) and isolated nodes."""
    from bread_spark.extensions.dedup import connected_components

    n, edges = case
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    norm = [(min(a, b), max(a, b)) for a, b in edges]
    pairs = spark.createDataFrame(norm or [(0, 0)], "doc_a long, doc_b long")
    if not norm:
        pairs = pairs.filter("doc_a <> doc_a")  # empty edge frame, typed
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(docs, pairs).collect()
    }
    assert got == python_components(n, edges)


def test_connected_components_long_chain_converges_or_raises(spark):
    """A 30-node path graph (diameter > the old hardcoded 20-round cap)
    must fully converge to one component under the default node-count
    safety cap, and an explicitly too-small cap must RAISE instead of
    returning split clusters (ADVICE r2 #1)."""
    import pytest

    from bread_spark.extensions.dedup import connected_components

    n = 30
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(docs, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(docs, pairs, max_iters=3).collect()


def test_minhash_signatures_duplicate_insensitive(spark, sf_dir):
    """Signatures from the no-distinct shingle stream must equal those
    from the distinct stream (min-aggregation absorbs duplicates) — the
    invariant that lets minhash_lsh_candidates skip the dedup shuffle."""
    from bread_spark.extensions.dedup import (
        _word_shingles,
        _word_shingles_with_dups,
        minhash_signatures,
    )
    from bread_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["signature"] for r in minhash_signatures(_word_shingles(docs)).collect()}
    b = {r["doc_id"]: r["signature"] for r in minhash_signatures(_word_shingles_with_dups(docs)).collect()}
    assert a == b


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_trigram_lm_is_a_probability_model(spark, texts):
    """On any corpus: every per-token probability is in (0, 1] — so every
    mean log10-prob is ≤ 0 — and n_tokens equals the doc's true token
    count; docs with zero tokens are out of scope (both engines agree)."""
    from bread_spark.extensions.curation import trigram_logprob_scores_df

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in trigram_logprob_scores_df(df).collect()}
    for i, t in rows:
        n = len([w for w in t.split(" ") if w])
        if n == 0:
            assert i not in out
        else:
            assert out[i]["n_tokens"] == n
            assert out[i]["mean_logp"] <= 1e-9


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="xyz ", min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_bm25_scores_only_matching_docs_positively(spark, texts):
    """On any corpus: exactly the docs containing a query term are
    scored, and every score is strictly positive (the +1 inside the idf
    log keeps idf > 0 even for a term in every doc)."""
    from bread_spark.extensions.search import bm25_search_df

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["score"] for r in bm25_search_df(df, ["x", "xy"], top_n=100).collect()}
    expect = {i for i, t in rows if {"x", "xy"} & set(t.split(" "))}
    assert set(out) == expect
    assert all(s > 0 for s in out.values())


# ---------------------------------------------------------------------------
# r8 families: NB merge algebra + silhouette bounds, on arbitrary corpora
# ---------------------------------------------------------------------------

nb_doc = st.tuples(
    st.sampled_from(["aa", "bb", "cc"]),
    st.lists(st.sampled_from(["t0", "t1", "t2", "t3", "t4"]), min_size=0, max_size=8),
)


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(nb_doc, min_size=2, max_size=24), st.integers(2, 4))
def test_nb_merge_equals_retrain_on_arbitrary_corpora(spark, docs, n_shards):
    """For ANY corpus and ANY shard split, folding per-shard NB models
    equals training once on the union — the additive-counts algebra,
    not just the fixture the scale smoke uses."""
    import pyspark.sql.functions as F

    from bread_spark.extensions.classify import merge_nb_models, nb_model_df
    from bread_spark.functions.text import _split_assignment

    rows = [
        (i, lang, " ".join(toks) + f" u{i}")  # unique tail → distinct texts
        for i, (lang, toks) in enumerate(docs)
    ]
    tagged = _split_assignment(
        spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ).localCheckpoint()
    full = {
        (r["lang"], r["bucket"]): (r["cnt"], r["log_lik"])
        for r in nb_model_df(tagged).collect()
    }
    shards = [
        nb_model_df(tagged.filter(F.pmod(F.col("doc_id"), n_shards) == i))
        for i in range(n_shards)
    ]
    merged = shards[0]
    for s in shards[1:]:
        merged = merge_nb_models(merged, s)
    got = {
        (r["lang"], r["bucket"]): (r["cnt"], r["log_lik"]) for r in merged.collect()
    }
    assert got == full


emb_point = st.tuples(
    st.integers(0, 2),
    st.lists(
        st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4
    ),
)


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(emb_point, min_size=4, max_size=20))
def test_silhouette_bounds_and_self_consistency(spark, points):
    """For ANY labeled point set with ≥2 labels: every silhouette lies in
    [-1, 1], nearest_label is never the own label, and the sign agrees
    with the a-vs-b comparison that defines it."""
    from hypothesis import assume

    from bread_spark.extensions.similarity import silhouette_scores_df

    assume(len({lab for lab, _ in points}) >= 2)
    rows = [
        (i, [float(x) for x in vec], int(lab)) for i, (lab, vec) in enumerate(points)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    for r in silhouette_scores_df(emb).collect():
        assert -1.0 <= r["silhouette"] <= 1.0, r
        assert r["nearest_label"] != r["label"], r
        if r["intra_dist"] < r["nearest_dist"]:
            assert r["silhouette"] >= 0.0, r
        elif r["intra_dist"] > r["nearest_dist"]:
            assert r["silhouette"] <= 0.0, r


@settings(max_examples=min(3, EXAMPLES), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    n_edits=st.integers(1, 10),
)
def test_fuzzy_finds_randomly_mutated_copy(spark, seed, n_edits):
    """Property: for a random long string and a copy with n random
    single-char substitutions (n <= 10), the blocked fuzzy pipeline
    finds the pair and reports dist <= n (each substitution costs at
    most one edit; fewer if two edits collide on one position)."""
    import random

    from bread_spark.extensions.fuzzy import fuzzy_pairs_df

    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(rng.choices(alpha, k=rng.randint(3, 8))) for _ in range(40)]
    base = " ".join(words)
    chars = list(base)
    positions = rng.sample(
        [i for i, c in enumerate(chars) if c != " "], n_edits
    )
    for p in positions:
        chars[p] = rng.choice([c for c in alpha if c != chars[p]])
    mutated = "".join(chars)
    docs = spark.createDataFrame(
        [(0, base), (1, mutated)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_pairs_df(docs).collect()
    }
    assert (0, 1) in got
    assert 1 <= got[(0, 1)] <= n_edits


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    n_nodes=st.integers(2, 12),
)
def test_authority_rank_matches_reference_on_random_graphs(spark, seed, n_nodes):
    """Property: on arbitrary random weighted DAG-ish edge sets, the
    distributed integer PageRank equals the plain-Python recurrence
    bit for bit — every floor-division leak included."""
    import random

    import pyspark.sql.functions as F

    from bread_spark.extensions.graph import authority_rank_df
    from tests.test_graph import _reference_rank

    rng = random.Random(seed)
    edges = []
    for s in range(n_nodes):
        for d in range(n_nodes):
            if s != d and rng.random() < 0.3:
                edges.append((s, d, rng.randint(1, 9)))
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    if edges:
        edf = spark.createDataFrame(edges, "src long, dst long, w long")
    else:
        edf = spark.createDataFrame([], "src long, dst long, w long")
    got = {
        r["doc_id"]: r["rank_micro"]
        for r in authority_rank_df(nodes, edf).collect()
    }
    assert got == _reference_rank(n_nodes, edges)


# ---------------------------------------------------------------------------
# r9 second wave: collocations, constraint checks, novelty vs Python
# ---------------------------------------------------------------------------

_words = st.sampled_from(["a", "b", "c", "d", "e"])
_doc_texts = st.lists(
    st.lists(_words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=10,
)


def _python_pmi(texts):
    """Independent reference: counts, MIN_PAIR gate, the two-step floor
    score, (score, w1, w2) DESC order, TOP_K cut."""
    from bread_spark.extensions.collocations import MIN_PAIR, TOP_K

    uni, big = {}, {}
    for t in texts:
        toks = [w for w in t.split(" ") if w != ""]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for w1, w2 in zip(toks, toks[1:]):
            big[(w1, w2)] = big.get((w1, w2), 0) + 1
    n_total = sum(uni.values())
    rows = [
        (w1, w2, c12, uni[w1], uni[w2], ((c12 * 1_000_000) // uni[w1]) * n_total // uni[w2])
        for (w1, w2), c12 in big.items()
        if c12 >= MIN_PAIR
    ]
    rows.sort(key=lambda r: (r[5], r[0], r[1]), reverse=True)
    return rows[:TOP_K]


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(_doc_texts)
def test_pmi_matches_python_reference(spark, texts):
    from bread_spark.extensions.collocations import pmi_collocations_df
    from tests.test_collocations import _counts

    rows = [(i, "s", t) for i, t in enumerate(texts)]
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["n_w1"], r["n_w2"], r["pmi_lift_micro"])
        for r in pmi_collocations_df(*_counts(spark, rows)).collect()
    ]
    assert got == _python_pmi(texts)


_shingle_postings = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.sampled_from(["s1", "s2", "s3", "s4"]),
    ),
    min_size=1,
    max_size=20,
    unique=True,
)


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(_shingle_postings)
def test_novelty_matches_python_reference(spark, postings):
    from bread_spark.extensions.graph import novelty_scores_df

    first = {}
    per_doc = {}
    for doc_id, sh in postings:
        first[sh] = min(first.get(sh, doc_id), doc_id)
        per_doc.setdefault(doc_id, set()).add(sh)
    want = {
        d: (
            len(shs),
            sum(1 for sh in shs if first[sh] == d),
            sum(1 for sh in shs if first[sh] == d) * 1_000_000 // len(shs),
        )
        for d, shs in per_doc.items()
    }
    df = spark.createDataFrame(postings, "doc_id long, shingle string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_micro"])
        for r in novelty_scores_df(df).collect()
    }
    assert got == want


_orders_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # o_orderkey (dupes possible)
        st.integers(min_value=1, max_value=4),  # o_custkey (orphans possible)
        st.sampled_from(["O", "F", "P", "X"]),  # X = domain violation
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(_orders_rows, st.sets(st.integers(min_value=1, max_value=4), min_size=0, max_size=4))
def test_constraint_checks_match_python_reference(spark, orders_rows, cust_keys):
    from bread_spark.extensions.profile import constraint_checks_df

    orders = spark.createDataFrame(
        [(k, c, s, 1.0) for k, c, s in orders_rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(k,) for k in sorted(cust_keys)] or [(None,)],
        "c_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(1, 1.0, 0.05)], "l_orderkey long, l_quantity double, l_discount double"
    )
    documents = spark.createDataFrame([(1, "ab", 2)], "doc_id long, text string, n_chars long")
    events = spark.createDataFrame([(1, 0.0)], "event_id long, value double")
    got = {
        r["check_name"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in constraint_checks_df(
            orders, customer, lineitem, documents, events
        ).collect()
    }
    n = len(orders_rows)
    pk_viol = n - len({k for k, _, _ in orders_rows})
    status_viol = sum(1 for _, _, s in orders_rows if s not in ("O", "F", "P"))
    fk_viol = sum(1 for _, c, _ in orders_rows if c not in cust_keys)
    assert got["orders_pk_unique"] == (n, pk_viol, int(pk_viol == 0))
    assert got["orders_status_domain"] == (n, status_viol, int(status_viol == 0))
    assert got["orders_custkey_fk"] == (n, fk_viol, int(fk_viol == 0))
