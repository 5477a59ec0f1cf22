"""Streaming weighted reservoir — the online twin of the stratified
Efraimidis-Spirakis sampler (`functions/text.py::weighted_sample_by_source`).

A-ES is THE streaming weighted-sampling-without-replacement algorithm
(Efraimidis & Spirakis 2006 run it as a one-pass reservoir): each
arriving document draws its deterministic priority ln(u)/w and the
reservoir keeps the top-k priorities seen so far. Because the priority
rule is the SHARED `_wrs_scored` expression (md5(seed:doc_id) uniforms —
deterministic, not RNG state), the reservoir after any stream prefix
equals the batch stratified sample over exactly that prefix, row for
row — pinned in tests, including across a checkpoint restart.

Like the KMV bottom-k (and unlike the CMS/HLL/HDR folds), a top-k is
not expressible as a grouped streaming aggregation, so this is the
custom-stateful form: `applyInPandasWithState` keyed by source, state =
the ≤k (pri, doc_id, n_tokens) triples — STRICTLY bounded per source no
matter how long the stream runs. The 100 TB shape: per-source reservoirs
maintain themselves shard-locally and merge by concatenate-and-retruncate
(the same merge the micro-batch fold applies), so a fleet-wide sample
never revisits history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.text import WRS_PER_SOURCE_K, _wrs_scored


def weighted_reservoir_stream(docs: DataFrame, k: int = WRS_PER_SOURCE_K) -> DataFrame:
    """Running per-source A-ES reservoir over a (doc_id, source, text)
    document stream. Output per updated source: the full current
    reservoir (source, ver, rank, doc_id, n_tokens, priority) — `ver` a
    per-source monotone update counter so a consumer keeps MAX(ver).
    Update output mode; the priority is rounded only in the OUTPUT, the
    state competes on the full double (the batch entries' convention)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def round_half_up(x: float) -> float:
        # match Spark's F.round on doubles (BigDecimal.valueOf → shortest
        # decimal repr → setScale(6, HALF_UP)); Python's round() is
        # half-EVEN and disagrees at decimal-midpoint doubles
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    def fold(key, pdfs, state):
        pris, ids, toks, ver = (
            (list(state.get[0]), list(state.get[1]), list(state.get[2]), state.get[3])
            if state.exists
            else ([], [], [], 0)
        )
        rows = list(zip(pris, ids, toks))
        for pdf in pdfs:
            rows.extend(
                zip(
                    (float(p) for p in pdf["pri"]),
                    (int(d) for d in pdf["doc_id"]),
                    (int(t) for t in pdf["n_tokens"]),
                )
            )
        # priority DESC, doc_id ASC — the batch rank window's exact order
        rows.sort(key=lambda r: (-r[0], r[1]))
        rows = rows[:k]
        state.update(
            ([r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows], ver + 1)
        )
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(rows),
                "ver": [ver + 1] * len(rows),
                "rank": list(range(1, len(rows) + 1)),
                "doc_id": [r[1] for r in rows],
                "n_tokens": [r[2] for r in rows],
                "priority": [round_half_up(r[0]) for r in rows],
            }
        )

    return (
        _wrs_scored(docs)
        .groupBy("source")
        .applyInPandasWithState(
            fold,
            outputStructType=(
                "source string, ver long, rank long, doc_id long, "
                "n_tokens long, priority double"
            ),
            stateStructType=(
                "pris array<double>, ids array<long>, toks array<long>, ver long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
