"""PQ/ADC many-query regime guard (VERDICT r4 'What's wrong #1').

Pins that ``pq_topk`` / ``ivf_pq_topk``:
* route large query sets to the collect-free column regime whose PLAN
  SIZE is independent of the query count (no nested per-query literal
  tables, no ``queries.collect()``),
* produce rank lists IDENTICAL to the small-regime literal path
  (the ADC tables are built with the same left-to-right float64 fold
  in every regime, so scores are bit-equal),
* and that the pandas-UDF codebook fallback of ``_adc_table_col`` is
  bit-equal to the native-expression table builder.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_s2_spark.operators import similarity as sim

M, K = 4, 8
DIM = 16
SUBDIM = DIM // M


def _rng_vec(rng):
    return [float(x) for x in rng.uniform(-1.0, 1.0, DIM)]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    rows = [(f"v{i:05d}", _rng_vec(rng)) for i in range(400)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    df.count()
    books = rng.uniform(-1.0, 1.0, (M, K, SUBDIM)).astype(np.float64)
    cents = rng.uniform(-1.0, 1.0, (8, DIM)).astype(np.float64)
    return df, books, cents


def _queries(spark, n):
    rng = np.random.default_rng(1234)
    return spark.createDataFrame(
        [(f"q{i:05d}", _rng_vec(rng)) for i in range(n)],
        ["query_id", "embedding"],
    )


def _ranks(df):
    return sorted(tuple(r) for r in df.collect())


def test_pq_topk_regime_parity(spark, corpus, monkeypatch):
    """Same queries down both regimes -> identical rank lists."""
    df, books, _ = corpus
    q = _queries(spark, 60)  # 60*32 = 1920 literals: inside the budget
    lit = _ranks(sim.pq_topk(df, q, 5, books))
    monkeypatch.setattr(sim, "PQ_NATIVE_MAX_LITERALS", 0)
    col = _ranks(sim.pq_topk(df, q, 5, books))
    assert lit == col and len(lit) == 60 * 5


def test_ivf_pq_topk_regime_parity(spark, corpus, monkeypatch):
    df, books, cents = corpus
    q = _queries(spark, 40)
    lit = _ranks(sim.ivf_pq_topk(df, q, 5, cents, books, nprobe=3))
    monkeypatch.setattr(sim, "PQ_NATIVE_MAX_LITERALS", 0)
    col = _ranks(sim.ivf_pq_topk(df, q, 5, cents, books, nprobe=3))
    assert lit == col and len(lit) > 0


def test_pq_topk_many_queries_plan_bounded(spark, corpus):
    """~1k queries: the plan must NOT inline per-query tables.  At 1000
    queries the literal regime would be 32k literal doubles (far beyond
    the measured ~7 s codegen stall at 4096); the column regime's
    analyzed plan stays small and the job completes."""
    df, books, _ = corpus
    nq = 1000
    assert nq * M * K > sim.PQ_NATIVE_MAX_LITERALS
    q = _queries(spark, nq)
    out = sim.pq_topk(df, q, 3, books)
    plan = out._jdf.queryExecution().analyzed().toString()
    # independent of query count: far below even ONE query's worth of
    # per-query literals spelled as doubles
    assert len(plan) < 60_000, len(plan)
    rows = _ranks(out)
    assert len(rows) == nq * 3

    # spot-check bit-exactness vs a pure-python sequential-fold replay
    codes = {
        r["vec_id"]: list(r["__codes"])
        for r in sim.pq_assign_codes(df, books, "embedding", "__codes")
        .select("vec_id", "__codes")
        .collect()
    }
    qrows = {r["query_id"]: list(r["embedding"]) for r in q.collect()}
    for qid in ["q00000", "q00499", "q00999"]:
        tbl = sim._adc_table_for(qrows[qid], books)
        scored = []
        for vid, cs in codes.items():
            acc = 0.0
            for s, c in enumerate(cs):
                acc += tbl[s * K + c]
            scored.append((acc, vid))
        expect = [v for _, v in sorted(scored)[:3]]
        got = [v for (q_, rank, v) in rows if q_ == qid]
        assert got == expect, qid


def test_adc_table_col_pandas_fallback_bit_equal(spark, corpus, monkeypatch):
    """Force the codebook above the literal budget: the pandas-UDF table
    builder must be bit-equal to the native expression AND to the
    driver-side _adc_table_for."""
    df, books, _ = corpus
    q = _queries(spark, 8)
    native = q.select(
        "query_id", sim._adc_table_col("embedding", books).alias("t")
    ).collect()
    monkeypatch.setattr(sim, "PQ_NATIVE_MAX_LITERALS", 0)
    pand = q.select(
        "query_id", sim._adc_table_col("embedding", books).alias("t")
    ).collect()
    nat = {r["query_id"]: list(r["t"]) for r in native}
    pnd = {r["query_id"]: list(r["t"]) for r in pand}
    qv = {r["query_id"]: list(r["embedding"]) for r in q.collect()}
    for qid in nat:
        ref = sim._adc_table_for(qv[qid], books)
        assert nat[qid] == ref, qid  # exact float equality, no tolerance
        assert pnd[qid] == ref, qid
