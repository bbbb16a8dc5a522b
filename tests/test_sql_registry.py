"""Every spark.sql()-registered S2 function must equal its Column-API
twin bit-for-bit on scale ids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_s2_spark.functions import (
    s2_biased,
    s2_cell_from_latlng,
    s2_cell_to_token,
    s2_face,
    s2_level,
    s2_parent,
    s2_range_max,
    s2_range_min,
)
from rust_s2_spark.functions.sql_registry import register_sql_functions


@pytest.fixture(scope="module")
def ids(spark, sf_dir):
    register_sql_functions(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = orders.select(
        (F.col("o_orderkey") % 100).alias("k"),
        F.expr(
            "o_orderkey * 2654435761 % 4294967296 / 4294967296e0 * 160e0 - 80e0"
        ).alias("lat"),
        F.expr(
            "o_orderkey * 40503 % 4294967296 / 4294967296e0 * 360e0 - 180e0"
        ).alias("lng"),
    )
    out = df.withColumn("cell_id", s2_cell_from_latlng("lat", "lng")).cache()
    out.count()
    out.createOrReplaceTempView("sqlreg_ids")
    return out


def test_sql_functions_equal_column_api(spark, ids):
    col_side = ids.select(
        "cell_id",
        s2_level("cell_id").alias("lvl"),
        s2_parent("cell_id", 7).alias("p7"),
        s2_range_min("cell_id").alias("rmin"),
        s2_range_max("cell_id").alias("rmax"),
        s2_face("cell_id").alias("face"),
        s2_biased("cell_id").alias("biased"),
        s2_cell_to_token("cell_id").alias("tok"),
    )
    sql_side = spark.sql(
        """
        SELECT cell_id,
               s2_level(cell_id) AS lvl,
               s2_parent(cell_id, 7) AS p7,
               s2_range_min(cell_id) AS rmin,
               s2_range_max(cell_id) AS rmax,
               s2_face(cell_id) AS face,
               s2_biased(cell_id) AS biased,
               s2_token(cell_id) AS tok
        FROM sqlreg_ids
        """
    )
    assert col_side.exceptAll(sql_side).count() == 0
    assert sql_side.exceptAll(col_side).count() == 0


def test_sql_roundtrips(spark, ids):
    bad = spark.sql(
        """
        SELECT count(*) AS n FROM sqlreg_ids
        WHERE s2_from_token(s2_token(cell_id)) != cell_id
           OR NOT s2_is_valid(cell_id)
           OR NOT s2_is_leaf(cell_id)
           OR s2_parent(cell_id, s2_level(cell_id)) != cell_id
        """
    ).collect()[0]["n"]
    assert bad == 0


def test_sql_latlng_encode_matches_column(spark, ids):
    n = spark.sql(
        """
        SELECT count(*) AS n FROM sqlreg_ids
        WHERE s2_cell_from_latlng(lat, lng) != cell_id
        """
    ).collect()[0]["n"]
    assert n == 0


def test_angle_encoding_sql_equals_column_and_kernel(spark, ids):
    """s2_e5/e6/e7 SQL == Column API == numpy kernel (ties-away), and the
    int round-trip re-encodes to itself exactly."""
    import numpy as np

    from rust_s2_spark.functions import s2_deg_to_e, s2_e_to_deg
    from rust_s2_spark.kernels import angle as ak

    col_side = ids.select(
        "lat",
        s2_deg_to_e("lat", 5).alias("e5"),
        s2_deg_to_e("lat", 6).alias("e6"),
        s2_deg_to_e("lat", 7).alias("e7"),
        s2_deg_to_e(s2_e_to_deg(s2_deg_to_e("lat", 7), 7), 7).alias("e7_rt"),
    ).toPandas()
    sql_side = spark.sql(
        """
        SELECT lat, s2_e5(lat) AS e5, s2_e6(lat) AS e6, s2_e7(lat) AS e7,
               s2_e7(s2_e7_deg(s2_e7(lat))) AS e7_rt
        FROM sqlreg_ids
        """
    ).toPandas()
    col_side = col_side.sort_values("lat").reset_index(drop=True)
    sql_side = sql_side.sort_values("lat").reset_index(drop=True)
    for c in ("e5", "e6", "e7", "e7_rt"):
        assert (col_side[c].to_numpy() == sql_side[c].to_numpy()).all(), c
    lat = col_side["lat"].to_numpy(np.float64)
    for kk in (5, 6, 7):
        assert (ak.deg_to_e(lat, kk) == col_side[f"e{kk}"].to_numpy()).all(), kk
    assert (col_side["e7"].to_numpy() == col_side["e7_rt"].to_numpy()).all()
