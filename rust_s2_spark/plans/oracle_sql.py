"""DuckDB-oracle SQL builders.

These emit self-contained ANSI-ish SQL that DuckDB runs on the same
parquet tables to independently recompute what the Spark engine
computes. The centerpiece is a PURE-SQL S2 encoder: xyz → face/(u,v) →
(s,t) → (i,j) → 8 chained lookups against the 1024-entry Hilbert
table (embedded as VALUES) → signed 64-bit cell id. Only +,-,*,/,
sqrt, floor and integer bit ops are used, so for trig-free inputs the
result is bit-identical to the numpy kernels — a genuinely independent
implementation of the whole encode path.
"""

from __future__ import annotations

from ..kernels.hilbert import LOOKUP_POS

TWO62 = 1 << 62
TWO63 = 1 << 63


def lookup_values_cte(name: str = "lut") -> str:
    rows = ",".join(f"({i},{int(v)})" for i, v in enumerate(LOOKUP_POS))
    return f"{name}(idx, val) AS (SELECT * FROM (VALUES {rows}) t(idx, val))"


def xyz_to_ij_sql(x: str, y: str, z: str) -> dict[str, str]:
    """SQL expressions for face, u, v, s, t, i, j from xyz expressions."""
    ax, ay, az = f"abs({x})", f"abs({y})", f"abs({z})"
    # the reference picks face by strict > comparisons in a specific
    # order (stuv.rs:40-56); replicate exactly:
    face = (
        f"(CASE "
        f"WHEN {az} > (CASE WHEN {ay} > {ax} THEN {ay} ELSE {ax} END) THEN (CASE WHEN {z} < 0 THEN 5 ELSE 2 END) "
        f"WHEN {ay} > {ax} THEN (CASE WHEN {y} < 0 THEN 4 ELSE 1 END) "
        f"ELSE (CASE WHEN {x} < 0 THEN 3 ELSE 0 END) END)"
    )
    u = (
        f"(CASE face WHEN 0 THEN ({y})/({x}) WHEN 1 THEN -({x})/({y}) "
        f"WHEN 2 THEN -({x})/({z}) WHEN 3 THEN ({z})/({x}) "
        f"WHEN 4 THEN ({z})/({y}) ELSE -({y})/({z}) END)"
    )
    v = (
        f"(CASE face WHEN 0 THEN ({z})/({x}) WHEN 1 THEN ({z})/({y}) "
        f"WHEN 2 THEN -({y})/({z}) WHEN 3 THEN ({y})/({x}) "
        f"WHEN 4 THEN -({x})/({y}) ELSE -({x})/({z}) END)"
    )
    s = "(CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3*u) ELSE 1 - 0.5 * sqrt(1 - 3*u) END)"
    t = "(CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3*v) ELSE 1 - 0.5 * sqrt(1 - 3*v) END)"
    i = "GREATEST(0, LEAST(1073741823, CAST(floor(1073741824 * s) AS BIGINT)))"
    j = "GREATEST(0, LEAST(1073741823, CAST(floor(1073741824 * t) AS BIGINT)))"
    return {"face": face, "u": u, "v": v, "s": s, "t": t, "i": i, "j": j}


def hilbert_encode_ctes(src: str, key: str = "image_id") -> str:
    """CTE chain r7..r0 encoding (face, i, j) from ``src`` into a signed
    cell id column ``cell_id``. ``src`` must provide key, face, i, j."""
    parts = [lookup_values_cte()]
    prev = src
    for step, k in enumerate(range(7, -1, -1)):
        init = step == 0
        bits_in = "(face & 1)" if init else "bits"
        n_in = "CAST(face AS BIGINT) * 1152921504606846976" if init else "n"  # face << 60
        cte = (
            f"r{k} AS (SELECT {key}, face, i, j, "
            f"(l.val & 3) AS bits, "
            f"({n_in} | ((CAST(l.val AS BIGINT) // 4) * {1 << (k * 8)})) AS n "
            f"FROM {prev} JOIN lut l ON l.idx = "
            f"{bits_in} + (((i // {1 << (k * 4)}) % 16) * 64) + (((j // {1 << (k * 4)}) % 16) * 4)"
            f")"
        )
        parts.append(cte)
        prev = f"r{k}"
    # two's-complement wrap of n*2+1 without leaving BIGINT:
    # n - 2^63 done as two subtractions of 2^62
    final = (
        f"encoded AS (SELECT {key}, "
        f"CAST(CASE WHEN n >= {TWO62} THEN ((n - {TWO62}) - {TWO62}) * 2 + 1 "
        f"ELSE n * 2 + 1 END AS BIGINT) AS cell_id "
        f"FROM r0)"
    )
    parts.append(final)
    return ",\n".join(parts)


def trig_free_xyz_sql(key: str = "o_orderkey") -> str:
    """Deterministic xyz direction from integer keys — identical in any
    IEEE engine (no trig anywhere)."""
    # e-notation literals → DOUBLE arithmetic in both engines (plain
    # decimal literals would be DECIMAL-typed in Spark and DuckDB)
    k1 = f"(({key} * 2654435761) % 4294967296)"
    k2 = f"(((({k1} % 1048576) * 2654435761) + ({k1} % 524287)) % 4294967296)"
    x = f"(({k1} % 2000001 - 1000000) / 1e6)"
    y = f"(({k2} % 2000001 - 1000000) / 1e6)"
    z = f"((({k1} % 1381) * ({k2} % 1447)) % 2000001 - 1000000) / 1e6"
    return (
        f"SELECT {key} AS key_id, {x} AS x, {y} AS y, ({z}) AS z FROM orders "
        f"WHERE abs({x}) + abs({y}) + abs({z}) > 1e-3"
    )


def hilbert_oracle_query() -> str:
    """Full pure-SQL encode of the trig-free xyz table → (key_id, cell_id)."""
    proj = xyz_to_ij_sql("x", "y", "z")
    return f"""
WITH pts AS ({trig_free_xyz_sql()}),
fuv AS (SELECT key_id, x, y, z, {proj['face']} AS face FROM pts),
uv AS (SELECT key_id, face, {proj['u']} AS u, {proj['v']} AS v FROM fuv),
st AS (SELECT key_id, face, {proj['s']} AS s, {proj['t']} AS t FROM uv),
ij AS (SELECT key_id, face, {proj['i']} AS i, {proj['j']} AS j FROM st),
{hilbert_encode_ctes('ij', 'key_id')}
SELECT key_id, cell_id FROM encoded ORDER BY key_id
""".strip()
