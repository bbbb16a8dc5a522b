"""dbscan_clusters: deterministic DBSCAN composed from exact parts.

Pins (1) a hand-built two-cluster geometry with a border point that
touches BOTH clusters (the classic DBSCAN nondeterminism — here the
documented min-label rule must pick the smaller cluster id), (2)
brute-force parity against an independent python DBSCAN on a seeded
corpus, (3) min_pts=1 makes every point a singleton core.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from rust_s2_spark.functions import s2_cell_from_latlng
from rust_s2_spark.operators.clustering import dbscan_clusters


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id long, lat double, lng double"
    ).withColumn("cell_id", s2_cell_from_latlng("lat", "lng"))


def _collect(df):
    return sorted(
        (int(r["id"]), None if r["cluster"] is None else int(r["cluster"]), r["role"])
        for r in df.collect()
    )


def test_planted_two_clusters_and_min_label_border(spark):
    # equator points: lng offsets are exact angular distances.
    # A = ids 10-13 (0.003° ladder), B = ids 20-23 (same, shifted),
    # P = id 30 sits 0.0098° from A's edge and 0.0097° from B's edge:
    # within eps of ONE core in each cluster, closed neighborhood 3 <
    # min_pts=4 → border; the deterministic rule assigns min(10, 20).
    # id 40 is isolated noise.
    rows = [
        (10, 0.0, 0.000), (11, 0.0, 0.003), (12, 0.0, 0.006), (13, 0.0, 0.009),
        (20, 0.0, 0.0286), (21, 0.0, 0.0316), (22, 0.0, 0.0346), (23, 0.0, 0.0376),
        (30, 0.0, 0.0188),
        (40, 45.0, 90.0),
    ]
    got = _collect(dbscan_clusters(_df(spark, rows), 0.01, 4))
    want = sorted(
        [(10, 10, "core"), (11, 10, "core"), (12, 10, "core"), (13, 10, "core"),
         (20, 20, "core"), (21, 20, "core"), (22, 20, "core"), (23, 20, "core"),
         (30, 10, "border"),
         (40, None, "noise")]
    )
    assert got == want, got


def _brute_dbscan(rows, eps_deg, min_pts):
    """Independent python DBSCAN with the same deterministic rules."""
    s = 2.0 * math.sin(0.5 * math.radians(eps_deg))
    eps_c2 = s * s
    pts = {}
    for i, lat, lng in rows:
        la, ln = math.radians(lat), math.radians(lng)
        pts[i] = (
            math.cos(ln) * math.cos(la),
            math.sin(ln) * math.cos(la),
            math.sin(la),
        )
    nbr = {i: set() for i in pts}
    ids = sorted(pts)
    for i in ids:
        for j in ids:
            if j <= i:
                continue
            d2 = sum((a - b) ** 2 for a, b in zip(pts[i], pts[j]))
            if d2 <= eps_c2:
                nbr[i].add(j)
                nbr[j].add(i)
    cores = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    # components over the core-core graph, label = min id
    label = {}
    for i in sorted(cores):
        if i in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in nbr[v]:
                if w in cores and w not in seen:
                    seen.add(w)
                    stack.append(w)
        root = min(comp)
        for v in comp:
            label[v] = root
    out = []
    for i in ids:
        if i in cores:
            out.append((i, label[i], "core"))
        else:
            core_nbrs = [label[j] for j in nbr[i] if j in cores]
            if core_nbrs:
                out.append((i, min(core_nbrs), "border"))
            else:
                out.append((i, None, "noise"))
    return sorted(out)


def test_matches_brute_force_seeded(spark):
    rng = random.Random(88)
    # two dense patches + global scatter
    rows = []
    for i in range(25):
        rows.append((i, 10.0 + rng.uniform(-0.02, 0.02),
                     20.0 + rng.uniform(-0.02, 0.02)))
    for i in range(25, 45):
        rows.append((i, -30.0 + rng.uniform(-0.015, 0.015),
                     150.0 + rng.uniform(-0.015, 0.015)))
    for i in range(45, 70):
        rows.append((i, rng.uniform(-80, 80), rng.uniform(-179, 179)))
    df = _df(spark, rows)
    for eps, mp in [(0.02, 4), (0.01, 3)]:
        got = _collect(dbscan_clusters(df, eps, mp, max_iter=40))
        assert got == _brute_dbscan(rows, eps, mp), f"eps={eps} mp={mp}"


def test_min_pts_one_all_singleton_cores(spark):
    rows = [(i, float(i), float(2 * i)) for i in range(5)]
    got = _collect(dbscan_clusters(_df(spark, rows), 0.001, 1))
    assert got == [(i, i, "core") for i in range(5)]
