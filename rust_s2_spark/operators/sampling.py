"""Deterministic sampling for training-data pipelines.

Dataset balancing (language/source mix control) needs sampling that is
reproducible across runs, engines, and cluster sizes — so no RNG state:
the keep-decision is a pure function of the row id. u(id) = first 8 hex
chars of md5(id) as a uniform draw in [0, 1); a row is kept iff
u < fraction(stratum). Fully native SQL (md5 + conv — whole-stage
codegen, no shuffle: sampling is a scan-local filter at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = 4294967296.0


def deterministic_uniform(id_col) -> Column:
    """u(id) in [0,1): md5-derived, engine-portable (DuckDB twin:
    CAST('0x' || substring(md5(id), 1, 8) AS UBIGINT) / 2^32)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.substring(F.md5(c.cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(_U32)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row of stratum s with probability fractions[s]
    (deterministically — the same ids are kept on every run). Strata
    not listed get ``default_fraction``."""
    u = deterministic_uniform(id_col)
    frac = F.lit(float(default_fraction))
    for s, f in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(s), F.lit(float(f))).otherwise(frac)
    return df.where(u < frac)
