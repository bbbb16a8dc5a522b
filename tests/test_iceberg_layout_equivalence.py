"""Formal bound on the Iceberg clause (north_rule: "over Iceberg
tables ... at 10^12-image scale").

The sandbox has no `iceberg-spark-runtime` jar and no network to fetch
one (probed by test_iceberg_runtime_absent below — its skip/pass
output IS the probe record), so a real catalog cannot be wired here.
What the engine claims instead, and what this file PINS structurally,
is layout equivalence: `sources.images.layout_write` produces exactly
the file-level properties an Iceberg writer would produce for

    ALTER TABLE images WRITE ORDERED BY (cell_id_biased)
    -- i.e. write.distribution-mode=range + sort order ASC

  1. files tile DISJOINT ranges of the sort key (range distribution);
  2. rows inside every file are sorted by the key (sort order), so
     parquet page/row-group min-max stats are tight;
  3. a covering-range predicate prunes most FILES via footer min-max
     stats — the same decision Iceberg's manifest pruning makes from
     the same (lower_bound, upper_bound) per data file.

What this does NOT claim (recorded here so the claim stays bounded):
snapshot isolation, schema evolution, and the murmur3 `bucket(N, col)`
transform are Iceberg-catalog features with no parquet-layout
equivalent; swapping the sink for a real catalog is a write-path-only
change (`layout_transform` already matches the required sort spec).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from rust_s2_spark.sources.images import read_images_table, write_images_table

BIAS = -(2**63)


@pytest.fixture(scope="module")
def table_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("iceberg_eq") / "images")
    write_images_table(spark, sf_dir, path, with_bytes=False, n_buckets=16)
    return path


def _file_ranges(path):
    """(min, max, sorted_within) of cell_id_biased per parquet data
    file, read from the files DIRECTLY (pyarrow) — independent of the
    Spark reader, like Iceberg's manifest stats are independent of the
    query engine."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        t = pq.read_table(f, columns=["cell_id_biased"])
        col = t.column("cell_id_biased").to_pylist()
        if not col:
            continue
        out.append((min(col), max(col), col == sorted(col), len(col), f))
    return out


def test_iceberg_runtime_absent():
    """The probe, recorded as a test: no iceberg-spark-runtime jar in
    the Spark distribution and no other lakehouse runtime — the reason
    the Iceberg clause is bounded to layout equivalence. If a jar ever
    appears in this environment, this test FAILS, which is the signal
    to wire the real catalog (VERDICT r8 ask #1)."""
    import pyspark

    jars = os.listdir(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    lake = [j for j in jars if "iceberg" in j.lower() or "delta" in j.lower()]
    assert lake == [], (
        f"lakehouse runtime present ({lake}) — replace the parquet "
        f"stand-in in sources/images.py with a real catalog write"
    )


def test_files_tile_disjoint_sort_key_ranges(table_path):
    ranges = _file_ranges(table_path)
    assert len(ranges) >= 8  # n_buckets=16 minus possibly-empty tails
    by_min = sorted(ranges)
    for (lo1, hi1, _, _, f1), (lo2, hi2, _, _, f2) in zip(by_min, by_min[1:]):
        assert hi1 < lo2, f"overlapping files {f1} {f2}: {hi1} vs {lo2}"


def test_rows_sorted_within_every_file(table_path):
    for lo, hi, is_sorted, n, f in _file_ranges(table_path):
        assert is_sorted, f"{f} not sorted by cell_id_biased"
        assert n > 0 and lo <= hi


def test_footer_stats_prune_like_manifests(spark, table_path):
    """A tight covering-range predicate must reject MOST files on
    footer min-max alone — the same (lower_bound, upper_bound) pruning
    an Iceberg manifest scan performs. Uses the median file's own range
    as the probe (guaranteed non-empty, guaranteed prunable)."""
    ranges = sorted(_file_ranges(table_path))
    lo, hi = ranges[len(ranges) // 2][:2]
    touched = [1 for flo, fhi, *_ in ranges if not (fhi < lo or flo > hi)]
    assert sum(touched) <= max(2, len(ranges) // 4), (
        f"{sum(touched)}/{len(ranges)} files intersect one bucket's range"
    )
    # and the engine agrees: the filtered read returns exactly the rows
    # the stats said live there
    img = read_images_table(spark, table_path)
    got = img.where(
        (img.cell_id_biased >= lo) & (img.cell_id_biased <= hi)
    ).count()
    want = ranges[len(ranges) // 2][3]
    assert got == want
