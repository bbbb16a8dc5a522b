"""Greedy sequence packing: assign documents to token-budget packs.

LLM training pipelines concatenate documents into fixed-budget training
sequences ("packing"). The scalable shape: documents are grouped into
independent units (here: ``group_col``, e.g. a source shard or a cell
bucket), each group is packed GREEDILY in a deterministic order
(doc_id): keep appending docs while the running token total fits the
budget, else start a new pack. Oversized docs get a pack of their own.

Spark-side this is ``applyInPandas`` per group — one shuffle on the
group key. The greedy walk itself is a sequential per-row loop: each
pack boundary depends on the running total AFTER the previous reset,
so the recurrence is inherently order-dependent (a cumsum-with-reset
has no closed vectorized form). That is fine at scale because the
loop runs on plain Python ints over one group at a time, and groups
are bounded by the partition design (a source shard / cell bucket),
never the whole table — the cost is O(group size) with no Spark
overhead inside it.
Determinism: output is a pure function of (group, doc order, budget),
so re-runs and engine ports agree row-for-row — the driver oracle walks
the same order with a recursive CTE in DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(group, doc_id, n_tokens, pack_id, pack_pos): greedy packing of
    each group's docs (ordered by id) into packs of <= ``budget`` tokens
    (a doc longer than the budget becomes its own pack)."""
    out_schema = (
        f"{group_col} string, {id_col} long, {tokens_col} long, "
        "pack_id long, pack_pos long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = pdf[tokens_col].to_list()
        pack_id, pack_pos, acc, cur, pos = [], [], 0, 0, 0
        for t in toks:
            t = int(t)
            if pos > 0 and acc + t > budget:
                cur += 1
                acc, pos = 0, 0
            pack_id.append(cur)
            pack_pos.append(pos)
            acc += t
            pos += 1
        pdf = pdf[[group_col, id_col, tokens_col]].copy()
        pdf["pack_id"] = pack_id
        pdf["pack_pos"] = pack_pos
        return pdf

    return df.select(group_col, id_col, tokens_col).groupBy(group_col).applyInPandas(
        pack, out_schema
    )
