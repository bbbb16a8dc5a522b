"""k-dist eps selection (operators/clustering.suggest_eps): exact
order statistics of the k-th-NN chord² curve, and the end-to-end
contract — the suggested eps recovers planted hotspot clusters when
fed back into dbscan_clusters (closing the "eps must sit at the
hotspot NN scale or the role structure degenerates" footgun)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rust_s2_spark.functions import s2_cell_from_latlng
from rust_s2_spark.operators.clustering import (
    chord2_to_deg,
    dbscan_clusters,
    kth_nn_chord2,
    suggest_eps,
)


def _planted(spark):
    """Two tight 20-point hotspots (~0.004 deg jitter) + 60 isolated
    noise points on a >=8 deg grid. Deterministic, no RNG."""
    rows = []
    for i in range(20):  # cluster A around (40, -74)
        rows.append((i, 40.0 + 0.0004 * (i % 5), -74.0 + 0.0004 * (i // 5)))
    for i in range(20):  # cluster B around (-33, 151)
        rows.append(
            (100 + i, -33.0 + 0.0004 * (i % 5), 151.0 + 0.0004 * (i // 5))
        )
    n = 0
    for la in range(-40, 41, 16):  # noise: 6 lats x 10 lngs = 60 points
        for lo in range(-170, 170, 34):
            if abs(la - 40) + abs(lo + 74) < 20:
                la_, lo_ = la + 8, lo + 9  # keep clear of cluster A
            else:
                la_, lo_ = la, lo
            rows.append((1000 + n, float(la_), float(lo_)))
            n += 1
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    return df.withColumn("cell_id", s2_cell_from_latlng("lat", "lng"))


def test_kth_nn_matches_brute_force(spark):
    pts = _planted(spark)
    got = {
        int(r["id"]): float(r["k_dist_chord2"])
        for r in kth_nn_chord2(pts, 6, id_col="id").collect()
    }
    rows = pts.select("id", "lat", "lng").collect()
    import numpy as np

    ids = np.array([r["id"] for r in rows])
    lat = np.radians([r["lat"] for r in rows])
    lng = np.radians([r["lng"] for r in rows])
    xyz = np.stack(
        [np.cos(lng) * np.cos(lat), np.sin(lng) * np.cos(lat), np.sin(lat)],
        axis=1,
    )
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = {int(i): float(np.sort(row)[5]) for i, row in zip(ids, d2)}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12), i


def test_suggest_eps_recovers_planted_clusters(spark):
    pts = _planted(spark)
    eps_tab = {
        float(r["q"]): float(r["eps_chord2"])
        for r in suggest_eps(pts, 6, quantiles=(0.25, 0.4, 0.95), id_col="id")
        .collect()
    }
    assert list(eps_tab) == sorted(eps_tab)
    vals = [eps_tab[q] for q in sorted(eps_tab)]
    assert vals == sorted(vals)  # order statistics are monotone in q

    # q=0.4 = the 40/100 boundary: the largest CLUSTER k-dist — the
    # elbow sits between the 0.004-deg hotspot scale and the 8-deg
    # noise-grid scale, orders of magnitude apart
    eps_deg = chord2_to_deg(eps_tab[0.4])
    assert 0.0003 < eps_deg < 1.0
    assert chord2_to_deg(eps_tab[0.95]) > 5.0  # noise plateau

    out = dbscan_clusters(
        pts, eps_deg, 6, id_col="id", lat_col="lat", lng_col="lng"
    ).collect()
    by_role: dict[str, set[int]] = {}
    clusters: dict[int, set[int]] = {}
    for r in out:
        by_role.setdefault(r["role"], set()).add(int(r["id"]))
        if r["cluster"] is not None:
            clusters.setdefault(int(r["cluster"]), set()).add(int(r["id"]))
    a = set(range(20))
    b = set(range(100, 120))
    assert by_role["core"] == a | b
    assert by_role.get("noise") == {1000 + i for i in range(60)}
    assert sorted(map(sorted, clusters.values())) == [sorted(a), sorted(b)]


def test_suggest_eps_validates(spark):
    pts = _planted(spark).limit(4)
    with pytest.raises(ValueError, match="quantiles"):
        suggest_eps(pts, 3, quantiles=(0.0,), id_col="id")
    with pytest.raises(ValueError, match="k-dist"):
        suggest_eps(pts, 9, id_col="id")  # |df| <= k: curve is empty


def test_chord2_to_deg_roundtrip():
    for deg in (0.01, 0.5, 3.0, 45.0, 179.0):
        s = 2.0 * math.sin(0.5 * math.radians(deg))
        assert chord2_to_deg(s * s) == pytest.approx(deg, rel=1e-12)
    assert chord2_to_deg(4.0) == pytest.approx(180.0)
    assert chord2_to_deg(5.0) == pytest.approx(180.0)  # clamped


def test_log2_binning_weakly_monotone_at_power_boundaries(spark):
    """Round-9 ADVICE: suggest_eps' exactness rests on floor(log2(x))
    being weakly monotone in x; pin it at the bin boundaries by pushing
    values one ULP either side of powers of two through the SAME
    binning expression the operator uses."""
    import math

    from pyspark.sql import functions as F

    vals = []
    for e in range(-60, 61, 7):
        p = 2.0**e
        vals.extend([math.nextafter(p, 0.0), p, math.nextafter(p, math.inf)])
    vals = sorted(v for v in vals if v > 0.0)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    binc = F.when(F.col("v") == 0.0, F.lit(-1100)).otherwise(
        F.floor(F.log2("v"))
    ).cast("int")
    rows = df.select("i", binc.alias("b")).orderBy("i").collect()
    bins = [r["b"] for r in rows]
    assert bins == sorted(bins), "floor(log2) bin not weakly monotone at ULP boundaries"


def test_knn_df_empty_stats_frame_raises_build_hint(spark, sf_dir):
    """An injected stats frame with NO level-7 rows (including an
    entirely empty frame) must raise the build_cell_stats hint — never
    silently return an empty result (round-10 guard)."""
    import pytest
    from pyspark.sql import functions as F

    from rust_s2_spark.operators.knn import knn_join_df
    from rust_s2_spark.sources import images_from_orders

    img = images_from_orders(spark, sf_dir, with_bytes=False)
    probes = img.limit(5).select(
        F.col("image_id").cast("long").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lng").alias("qlng"),
    )
    empty_stats = spark.createDataFrame([], "level int, cell long, n long")
    with pytest.raises(ValueError, match="build_cell_stats"):
        knn_join_df(img, probes, 3, stats=empty_stats)
