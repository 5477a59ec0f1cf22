"""Property-based tests, models/quality half (hypothesis): the r8+
families — NB merge algebra, silhouette bounds, fuzzy mutation recall,
authority rank, collocations, novelty, constraint checks — vs
independent pure-Python references (SURVEY.md §5). Split from
test_properties.py in r13 (VERDICT r12 #3: the monolithic file was a
tier wall floor; two shard-addressable halves bin-pack)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import NIGHTLY

# Tiered example budget — same dial as test_properties.py
EXAMPLES = 5 if NIGHTLY else 2

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
