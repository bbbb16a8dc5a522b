"""Geofence exclusion: region_anti_filter / region_anti_join.

Pins the two regimes equal (one-scan negated filter vs ancestor
equi-join + left_anti) and the complement property: anti ∪ matched
partitions the table exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_s2_spark.geometry import Cap, Rect
from rust_s2_spark.operators.covering_join import (
    region_anti_filter,
    region_anti_join,
    region_filter,
)
from rust_s2_spark.sources import images_from_orders

CAPS = [
    Cap.from_latlng_degrees(40.7128, -74.0060, 3.0),
    Cap.from_latlng_degrees(-33.8688, 151.2093, 8.0),
    Cap.from_latlng_degrees(89.5, 0.0, 2.0),  # pole cap
]


@pytest.fixture(scope="module")
def images(spark, sf_dir):
    return images_from_orders(spark, sf_dir, with_bytes=False).localCheckpoint(
        eager=True
    )


def _ids(df):
    return sorted(int(r["image_id"]) for r in df.select("image_id").collect())


def test_filter_and_join_regimes_agree(spark, images):
    a = _ids(region_anti_filter(images, CAPS))
    b = _ids(region_anti_join(spark, images, CAPS))
    assert a == b and len(a) > 0


def test_complement_partitions_table(spark, images):
    anti = set(_ids(region_anti_join(spark, images, CAPS)))
    matched = set()
    for cap in CAPS:
        matched |= set(_ids(region_filter(images, cap)))
    all_ids = set(_ids(images))
    assert anti | matched == all_ids
    assert anti & matched == set()


def test_mixed_region_types(spark, images):
    regions = [CAPS[0], Rect.from_degrees(-10.0, 100.0, 10.0, 130.0)]
    a = _ids(region_anti_filter(images, regions))
    b = _ids(region_anti_join(spark, images, regions))
    assert a == b


def test_empty_region_list_keeps_all_rows(spark, images):
    assert _ids(region_anti_filter(images, [])) == _ids(images)
    assert _ids(region_anti_join(spark, images, [])) == _ids(images)


def test_null_coordinates_kept_by_both_regimes(spark):
    """A NULL-coordinate row is inside no region, so BOTH regimes keep
    it (a bare NOT(NULL-member) would silently drop it in the filter
    regime while left_anti keeps unmatched rows by construction)."""
    rows = [
        (1, 40.7128, -74.0060),  # inside the NYC cap → excluded
        (2, None, None),         # NULL coordinates → kept
        (3, 0.0, 0.0),           # far from every cap → kept
    ]
    df = spark.createDataFrame(
        rows, "image_id long, lat double, lng double"
    )
    from rust_s2_spark.functions import s2_biased, s2_cell_from_latlng

    df = df.withColumn("cell_id", s2_cell_from_latlng("lat", "lng"))
    df = df.withColumn("cell_id_biased", s2_biased("cell_id"))
    a = _ids(region_anti_filter(df, CAPS))
    b = _ids(region_anti_join(spark, df, CAPS))
    assert a == b == [2, 3]
