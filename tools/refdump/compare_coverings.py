"""Full cell-for-cell comparison of the Python RegionCoverer against every
reference-dumped covering in tests/golden/refdump.jsonl (459 cases; the
pytest subset skips the minutes-slow deep-interior ones). Run from the
repo root:

    python tools/refdump/compare_coverings.py
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from rust_s2_spark.geometry.cap import Cap
from rust_s2_spark.geometry.coverer import RegionCoverer
from rust_s2_spark.geometry.rect import Rect


def main() -> int:
    ok = bad = 0
    failures = []
    for line in open("tests/golden/refdump.jsonl"):
        d = json.loads(line)
        if d["kind"] != "covering":
            continue
        rc = RegionCoverer(
            min_level=d["min_level"],
            max_level=d["max_level"],
            level_mod=d["level_mod"],
            max_cells=d["max_cells"],
        )
        if d["region"] == "cap":
            lat, lng = math.radians(d["lat"]), math.radians(d["lng"])
            center = (
                math.cos(lng) * math.cos(lat),
                math.sin(lng) * math.cos(lat),
                math.sin(lat),
            )
            region = Cap.from_center_area(center, d["area"])
        else:
            region = Rect.from_degrees(
                d["lat_lo"], d["lng_lo"], d["lat_hi"], d["lng_hi"]
            )
        for key, fn in (
            ("covering", rc.covering),
            ("interior", rc.interior_covering),
            ("fast", rc.fast_covering),
        ):
            got = list(fn(region).tokens())
            if got == d[key]:
                ok += 1
            else:
                bad += 1
                failures.append((d["name"], key, got, d[key]))
    print(f"ok {ok} bad {bad}")
    for name, key, got, want in failures[:10]:
        print(name, key, "got", got[:6], "want", want[:6])
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
