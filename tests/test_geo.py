"""Geo blocking (functions/geo.py) — SURVEY §2 F9/F11.

The geohash check is against an INDEPENDENT pure-python bisection
encoder (the published interval-halving algorithm, sharing no
arithmetic with the closed-form interleave the Spark path uses);
neighbors are checked geometrically: the 8 blocking keys of a point
must equal the bisection-encoded hashes of the 8 physically adjacent
points one cell-width away.
"""

from pyspark.sql import functions as F

from lieu_spark.functions.geo import (
    geo_aliases,
    geohash_cells,
    geohash_cells_exploded,
    geohash_encode,
    parse_latlon,
    total_docs_by_geo,
)

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def py_geohash(lat, lon, p):
    lat_i = [-90.0, 90.0]
    lon_i = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < 5 * p:
        iv = lon_i if even else lat_i
        x = lon if even else lat
        mid = (iv[0] + iv[1]) / 2
        if x >= mid:
            bits.append(1)
            iv[0] = mid
        else:
            bits.append(0)
            iv[1] = mid
        even = not even
    return "".join(
        B32[int("".join(map(str, bits[i : i + 5])), 2)] for i in range(0, 5 * p, 5)
    )


def _pts(n=200, seed=7):
    import random

    rng = random.Random(seed)
    return [
        (rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9)) for _ in range(n)
    ]


def test_geohash_encode_matches_bisection_oracle(spark):
    pts = _pts()
    df = spark.createDataFrame(pts, ["lat", "lon"])
    for p in (3, 4, 5):  # odd and even bit splits
        got = [
            r.gh
            for r in df.select(
                geohash_encode(F.col("lat"), F.col("lon"), p).alias("gh")
            ).collect()
        ]
        assert got == [py_geohash(lat, lon, p) for lat, lon in pts], p


def test_geohash_neighbors_are_adjacent_cells(spark):
    # cell widths at p=4: lat 180/2^10, lon 360/2^10
    dlat, dlon = 180.0 / 1024, 360.0 / 1024
    pts = [(q, r) for q, r in _pts(50, seed=11) if abs(q) < 88.0]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    rows = df.select(
        geohash_cells(F.col("lat"), F.col("lon"), 4).alias("cells")
    ).collect()
    for (lat, lon), row in zip(pts, rows):
        want = {
            py_geohash(
                lat + i * dlat,
                ((lon + j * dlon + 180.0) % 360.0) - 180.0,
                4,
            )
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        }
        assert set(row.cells) == want, (lat, lon)
        assert len(row.cells) == 9


def test_geohash_cells_skip_past_pole(spark):
    df = spark.createDataFrame([(89.99, 10.0), (-89.99, 10.0)], ["lat", "lon"])
    ns = [r.n for r in df.select(F.size(geohash_cells(F.col("lat"), F.col("lon"), 4)).alias("n")).collect()]
    assert ns == [6, 6]  # top/bottom row: no cells beyond the pole


def test_geohash_cells_exploded_matches_column_form(spark):
    # the DataFrame-level fan-out (explode offsets, encode once) must
    # produce exactly the Column form's key multiset per row — including
    # pole skipping and the antimeridian wrap
    pts = _pts(60, seed=13) + [(89.99, 10.0), (-89.99, 10.0), (0.0, 179.99)]
    df = spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(pts)], ["id", "lat", "lon"]
    )
    col_form = {
        r.id: sorted(r.cells)
        for r in df.select(
            "id", geohash_cells(F.col("lat"), F.col("lon"), 4).alias("cells")
        ).collect()
    }
    exploded = (
        geohash_cells_exploded(df, F.col("lat"), F.col("lon"), 4)
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("geo")).alias("cells"))
        .collect()
    )
    assert {r.id: list(r.cells) for r in exploded} == col_form
    # carries the input columns through untouched
    cols = geohash_cells_exploded(df, F.col("lat"), F.col("lon"), 4).columns
    assert cols == ["id", "lat", "lon", "geo"]


def test_parse_latlon_reference_cases(spark):
    cases = [
        ("40°42′46″N", "74°00′21″W"),
        ("40.74 N", "74.001 W"),
        ("40,74", "-74,001"),
        ("lat: 40.7128°", "lon: -74.0060°"),
        ("91.0", "10.0"),
        ("45.0", "200.0"),
        ("90", "-180"),
        ("garbage", "junk"),
        # uppercase unit marks: the reference compiles its DMS and
        # decimal-with-direction regexes with re.I, so 'D'/'M'/'S'
        # parse identically to '°'/'′'/'″' (the bare fallback would
        # otherwise strip the trailing S and return 40.0/garbage)
        ("40D30M15S", "74D00M21SW"),
        ("40.74D N", "74.001D W"),
    ]
    df = spark.createDataFrame(cases, ["lat_s", "lon_s"])
    got = [
        (None if r.p is None else (round(r.p.lat, 9), round(r.p.lon, 9)))
        for r in df.select(
            parse_latlon(F.col("lat_s"), F.col("lon_s")).alias("p")
        ).collect()
    ]
    assert got == [
        # DMS with the hemisphere sign APPLIED (reference bug fixed:
        # coordinates.py:129-135 drops the W sign; see geo.py docstring)
        (round(40 + 42 / 60 + 46 / 3600, 9), round(-(74 + 21 / 3600), 9)),
        (40.74, -74.001),
        (40.74, -74.001),
        (40.7128, -74.006),
        None,  # |lat| > 90 invalid
        (45.0, -160.0),  # lon wrapped into (-180, 180]
        (89.9999, 180.0),  # lat clamped, -180 wraps to +180
        None,
        (round(40 + 30 / 60 + 15 / 3600, 9), round(-(74 + 21 / 3600), 9)),
        (40.74, -74.001),
    ]


def test_total_docs_by_geo_counts_fan_in(spark):
    dlat, dlon = 180.0 / 1024, 360.0 / 1024
    base_lat, base_lon = 10.0 + dlat / 2, 20.0 + dlon / 2
    rows = [(base_lat, base_lon)] * 3 + [(base_lat, base_lon + dlon)] * 2
    df = spark.createDataFrame(rows, ["lat", "lon"]).select(
        geohash_cells(F.col("lat"), F.col("lon"), 4).alias("cells")
    )
    by_geo = {r.geo: r.n_docs for r in total_docs_by_geo(df).collect()}
    # every row lands in its cell + 8 neighbors
    assert sum(by_geo.values()) == len(rows) * 9
    # adjacent cells see each other's rows
    assert by_geo[py_geohash(base_lat, base_lon, 4)] == 5
    assert by_geo[py_geohash(base_lat, base_lon + dlon, 4)] == 5
    assert by_geo[py_geohash(base_lat + dlat, base_lon, 4)] == 5


def test_geo_aliases_argmax_qualifying_neighbor(spark):
    # hand-built counts: a sparse cell between two physically adjacent
    # dense cells aliases to the higher-count one; dense cells and
    # sparse cells with no qualifying neighbor emit nothing
    dlat, dlon = 180.0 / 1024, 360.0 / 1024
    lat, lon = 10.0 + dlat / 2, 20.0 + dlon / 2
    center = py_geohash(lat, lon, 4)
    west = py_geohash(lat, lon - dlon, 4)
    east = py_geohash(lat, lon + dlon, 4)
    lonely = py_geohash(-40.0, -100.0, 4)  # sparse, no neighbors present
    by_geo = spark.createDataFrame(
        [(center, 5), (west, 120), (east, 100), (lonely, 3)],
        ["geo", "n_docs"],
    )
    al = {
        r.geo: r.alias_geo
        for r in geo_aliases(by_geo, min_doc_count=50, precision=4).collect()
    }
    assert al == {center: west}


def test_parse_latlon_nonfinite_lon_nulls_pair(spark):
    # try_cast('1e999') is +Infinity; the wrap turns it into NaN, and
    # NaN passes isNotNull — the finite gate must null the pair (the
    # reference's is_valid_longitude raises on inf/nan)
    df = spark.createDataFrame(
        [("40.5", "1e999"), ("1e999", "70.1"), ("40.5", "70.1")],
        "lat_s string, lon_s string",
    )
    rows = df.select(
        parse_latlon(F.col("lat_s"), F.col("lon_s")).alias("p")
    ).collect()
    assert rows[0].p is None
    assert rows[1].p is None
    assert rows[2].p is not None and abs(rows[2].p.lat - 40.5) < 1e-9


def test_null_coordinates_never_block(spark):
    # F.least SKIPS nulls, so a null axis used to quantize to the TOP
    # cell — every unparseable coordinate blocked into the 'zzzz'
    # corner (bogus candidates + a skew hotspot). Null coords must
    # yield a null geohash and an empty cell set.
    df = spark.createDataFrame(
        [("garbage", "junk"), ("45.5", "-122.6")], "lat_s string, lon_s string"
    )
    p = parse_latlon(F.col("lat_s"), F.col("lon_s"))
    rows = df.withColumn("__p", p).select(
        geohash_encode(F.col("__p.lat"), F.col("__p.lon"), 4).alias("gh"),
        geohash_cells(F.col("__p.lat"), F.col("__p.lon"), 4).alias("cells"),
    ).collect()
    assert rows[0].gh is None and rows[0].cells == []
    assert rows[1].gh is not None and len(rows[1].cells) == 9
    # the exploded DataFrame form drops the row entirely (no keys)
    ex = geohash_cells_exploded(
        df.withColumn("__p", p), F.col("__p.lat"), F.col("__p.lon"), 4
    )
    assert ex.filter(F.col("geo").isNull()).count() == 0
    assert ex.count() == 9
