"""Geo blocking: coordinate parsing + geohash cells — SURVEY §2 F9/F11.

Reference parity:
- latlon parsing: /root/reference/lib/lieu/coordinates.py:24-167
  (latlon_to_decimal: strip junk, ','->'.', DMS / decimal-with-
  direction / bare-decimal fallbacks, validity, lat clamp +-90 ->
  +-89.9999, lon wrap to (-180, 180]). DIVERGENCE, documented: the
  reference computes the hemisphere sign for the DMS branch and then
  never applies it (coordinates.py:129-135 — its own doctest returns
  +74.005 for '74°00′21″W'); we apply the sign, which is the behavior
  its decimal-with-direction branch already has.
- geohash cell + 8 neighbors as blocking keys:
  /root/reference/lib/lieu/spark/geo_word_index.py:8-15 (encode
  truncated to precision 4, plus geohash.neighbors for fault-line
  tolerance) and total_docs_by_geo / geo_aliases (ibid:19-51).

Everything is a pure Catalyst expression (regexp branches, IEEE
double arithmetic, closed-form bit interleaving, substring-on-alphabet
base32) — whole-stage codegen, no UDF, no shuffle until the blocking
agg — and every step is replayable in ANSI SQL, so the DuckDB oracle
re-derives each cell id from the raw coordinate strings. The geohash
quantization (floor((lat+90)/180 * 2^bits)) is exactly the published
binary-subdivision encoding; +, *, / are correctly-rounded IEEE ops,
so the cell ids are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# reference regexes (coordinates.py:27-34), Java-dialect twins. The
# DMS body accepts degrees + optional minutes/seconds with their unit
# marks; direction letter optional. The reference compiles every one
# with re.I, so uppercase unit marks ('40D30M15S') parse — the inline
# (?i) is the Java spelling of that flag (the marks are ASCII, so
# ASCII-only case folding is exact parity).
_LAT_DMS = (
    r"(?i)^(-?[0-9]{1,2})[ ]*[ :°ºd][ ]*([0-5]?[0-9])?[ ]*[:'′m]?"
    r"[ ]*([0-5]?[0-9](?:\.\d+)?)?[ ]*[:?\"″s]?[ ]*(N|n|S|s)?$"
)
_LON_DMS = (
    r"(?i)^(-?1[0-8][0-9]|0?[0-9]{1,2})[ ]*[ :°ºd][ ]*([0-5]?[0-9])?[ ]*[:'′m]?"
    r"[ ]*([0-5]?[0-9](?:\.\d+)?)?[ ]*[:?\"″s]?[ ]*(E|e|W|w)?$"
)
_LAT_DIR = r"(?i)^(-?[0-9][0-9](?:\.[0-9]+))[ ]*[ :°ºd]?[ ]*(N|n|S|s)$"
_LON_DIR = r"(?i)^(-?1[0-8][0-9]|0?[0-9][0-9](?:\.[0-9]+))[ ]*[ :°ºd]?[ ]*(E|e|W|w)$"


def _sign(direction: Column) -> Column:
    return F.when(F.lower(direction).isin("s", "w"), F.lit(-1.0)).otherwise(
        F.lit(1.0)
    )


def _parse_one(raw: Column, dms_re: str, dir_re: str) -> Column:
    """One coordinate string -> decimal double (null if unparseable).
    Branch order mirrors the reference: DMS, then decimal-with-
    direction, then strip non-numeric junk off both ends and cast."""
    s = F.regexp_replace(F.trim(raw, F.lit(" ,;|")), F.lit(","), F.lit("."))
    deg = F.regexp_extract(s, dms_re, 1)
    mins = F.regexp_extract(s, dms_re, 2)
    secs = F.regexp_extract(s, dms_re, 3)
    dms_dir = F.regexp_extract(s, dms_re, 4)
    dms_val = _sign(dms_dir) * (
        deg.try_cast("double")
        + F.coalesce(mins.try_cast("double"), F.lit(0.0)) / 60.0
        + F.coalesce(secs.try_cast("double"), F.lit(0.0)) / 3600.0
    )
    dir_val = _sign(F.regexp_extract(s, dir_re, 2)) * F.regexp_extract(
        s, dir_re, 1
    ).try_cast("double")
    bare = F.regexp_replace(
        F.regexp_replace(s, r"^[^0-9\-]+", ""), r"[^0-9]+$", ""
    ).try_cast("double")
    return (
        F.when(s.rlike(dms_re), dms_val)
        .when(s.rlike(dir_re), dir_val)
        .otherwise(bare)
    )


def parse_latlon(lat_raw: Column, lon_raw: Column) -> Column:
    """struct(lat, lon) of decimal doubles from coordinate strings —
    the latlon_to_decimal twin (reference coordinates.py:110-167).
    Invalid latitude (|lat| > 90) nulls the pair, exactly like the
    reference's ValueError; +-90 clamps to +-89.9999 and the longitude
    wraps to (-180, 180] via 180 - pmod(180 - lon, 360)."""
    lat = _parse_one(lat_raw, _LAT_DMS, _LAT_DIR)
    lon = _parse_one(lon_raw, _LON_DMS, _LON_DIR)
    lat = F.when(F.abs(lat) <= 90.0, lat)
    lat = (
        F.when(lat == 90.0, F.lit(89.9999))
        .when(lat == -90.0, F.lit(-89.9999))
        .otherwise(lat)
    )
    # non-finite gate BEFORE the wrap: try_cast('1e999') is +Infinity,
    # the wrap would turn it into NaN, and NaN passes isNotNull — the
    # pair would emit and quantize to a garbage corner cell. abs < inf
    # is false for NaN and both infinities (the reference's
    # is_valid_longitude rejects them; lat is already covered by the
    # abs(lat) <= 90 gate above, which NaN/inf fail).
    lon = F.when(F.abs(lon) < F.lit(float("inf")), lon)
    lon = F.lit(180.0) - F.pmod(F.lit(180.0) - lon, F.lit(360.0))
    return F.when(
        lat.isNotNull() & lon.isNotNull(), F.struct(lat.alias("lat"), lon.alias("lon"))
    )


def _bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    return lon_bits, total - lon_bits


def quantize(lat: Column, lon: Column, precision: int) -> tuple[Column, Column]:
    """Cell indices (lat_q, lon_q) — floor of the unit position scaled
    to 2^bits, clamped so lat=90 / lon=180 land in the top cell.

    NULL coordinates stay NULL: F.least SKIPS nulls (SQL GREATEST/LEAST
    semantics), so without the guard a null axis silently became the
    top cell index — every unparseable coordinate blocked into the
    lat~90/lon~180 'zzzz' corner (bogus candidate pairs + a skew
    hotspot; the reference filters `lat is not None` before hashing).
    A null index propagates to a null geohash through the interleave
    arithmetic, and null blocking keys never equi-join."""
    lon_bits, lat_bits = _bits(precision)
    lat_q = F.when(
        lat.isNotNull() & lon.isNotNull(),
        F.least(
            F.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)).cast("long"),
            F.lit((1 << lat_bits) - 1),
        ),
    )
    lon_q = F.when(
        lat.isNotNull() & lon.isNotNull(),
        F.least(
            F.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)).cast("long"),
            F.lit((1 << lon_bits) - 1),
        ),
    )
    return lat_q, lon_q


def _positions(total: int):
    """(lon_pos, lat_pos) bit-slot functions for the interleave — lon
    leads from the MSB; the parity of the total bit count decides which
    axis owns the even slots. ONE copy: the encode (geohash_from_ints)
    and the decode (geo_aliases) must use the same layout or they
    silently diverge."""
    if total % 2 == 0:
        return (lambda j: 2 * j + 1), (lambda j: 2 * j)
    return (lambda j: 2 * j), (lambda j: 2 * j + 1)


def _neighbor_offsets(include_center: bool) -> Column:
    """The 3x3 (dlat, dlon) offset structs, optionally without (0,0)."""
    return F.array(
        *[
            F.struct(F.lit(dlat).alias("dlat"), F.lit(dlon).alias("dlon"))
            for dlat in (-1, 0, 1)
            for dlon in (-1, 0, 1)
            if include_center or not (dlat == 0 and dlon == 0)
        ]
    )


def _fan_out_neighbors(
    staged: DataFrame, precision: int, include_center: bool
) -> DataFrame:
    """Explode the neighbor offsets over staged ``__lat_q``/``__lon_q``
    index columns: longitude wraps mod 2^lon_bits (the antimeridian is
    adjacent), latitude rows past the poles don't exist and are
    filtered. Emits ``__nlat``/``__nlon`` as plain columns so callers
    encode ONCE on the staged indices (encoding inside 8-9 branch
    expressions inlines the 5p-bit interleave ~36x and the
    codegen/analysis cost dominates small inputs). ONE copy of the
    wrap/pole semantics shared by geohash_cells_exploded and
    geo_aliases."""
    lon_bits, lat_bits = _bits(precision)
    return (
        staged.select("*", F.explode(_neighbor_offsets(include_center)).alias("__o"))
        .withColumn("__nlat", F.col("__lat_q") + F.col("__o.dlat"))
        .withColumn(
            "__nlon",
            F.pmod(F.col("__lon_q") + F.col("__o.dlon"), F.lit(1 << lon_bits)),
        )
        .filter((F.col("__nlat") >= 0) & (F.col("__nlat") < (1 << lat_bits)))
    )


def geohash_from_ints(lat_q: Column, lon_q: Column, precision: int) -> Column:
    """base32 geohash from cell indices: closed-form bit interleave
    (lon leads from the MSB) + substring-on-alphabet per 5-bit group.
    All plain long arithmetic — 5*precision adds, no fold, no UDF."""
    lon_bits, lat_bits = _bits(precision)
    total = 5 * precision
    z = F.lit(0).cast("long")
    # even total: lon bit j sits at position 2j+1, lat bit j at 2j;
    # odd total: lon at 2j, lat at 2j+1 (lon has one extra bit).
    lon_pos, lat_pos = _positions(total)
    for j in range(lon_bits):
        z = z + F.shiftleft(F.shiftright(lon_q, j).bitwiseAND(F.lit(1)), lon_pos(j))
    for j in range(lat_bits):
        z = z + F.shiftleft(F.shiftright(lat_q, j).bitwiseAND(F.lit(1)), lat_pos(j))
    chars = [
        F.substring(
            F.lit(BASE32),
            (F.shiftright(z, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
            1,
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode(lat: Column, lon: Column, precision: int = 4) -> Column:
    """geohash.encode(lat, lon)[:precision] twin
    (reference geo_word_index.py:10-11)."""
    lat_q, lon_q = quantize(lat, lon, precision)
    return geohash_from_ints(lat_q, lon_q, precision)


def geohash_cells(lat: Column, lon: Column, precision: int = 4) -> Column:
    """array<string>: the cell plus its 8 neighbors — the reference's
    geohashes() blocking keys (geo_word_index.py:13-15, fault-line
    tolerance). Neighbor arithmetic on the cell indices: longitude
    wraps mod 2^lon_bits (the antimeridian is adjacent), latitude rows
    past the poles don't exist and are skipped (python-geohash returns
    fewer neighbors at the poles too)."""
    lon_bits, lat_bits = _bits(precision)
    lat_q, lon_q = quantize(lat, lon, precision)
    cells = [geohash_from_ints(lat_q, lon_q, precision)]
    for dlat in (-1, 0, 1):
        for dlon in (-1, 0, 1):
            if dlat == 0 and dlon == 0:
                continue
            nlat = lat_q + F.lit(dlat)
            nlon = F.pmod(lon_q + F.lit(dlon), F.lit(1 << lon_bits))
            cells.append(
                F.when(
                    (nlat >= 0) & (nlat < (1 << lat_bits)),
                    geohash_from_ints(nlat, nlon, precision),
                )
            )
    return F.filter(F.array(*cells), lambda c: c.isNotNull())


def geohash_cells_exploded(
    df: DataFrame, lat: Column, lon: Column, precision: int = 4, out: str = "geo"
) -> DataFrame:
    """One row per blocking key (cell + up to 8 neighbors) — the
    DataFrame-level form of :func:`geohash_cells`. The Column form
    inlines the 5p-bit interleave + base32 encode once per neighbor
    (9x); on small inputs the Catalyst analysis/codegen cost of that
    tree dominates the data. Here the quantized indices are staged as
    real columns, the 9 offsets are exploded FIRST, and the encode
    runs once on the staged neighbor indices — same keys, ~9x smaller
    expression tree. Pole rows are skipped and longitude wraps, exactly
    like the Column form."""
    lat_q, lon_q = quantize(lat, lon, precision)
    staged = df.select("*", lat_q.alias("__lat_q"), lon_q.alias("__lon_q"))
    fanned = _fan_out_neighbors(staged, precision, include_center=True)
    return fanned.withColumn(
        out, geohash_from_ints(F.col("__nlat"), F.col("__nlon"), precision)
    ).drop("__lat_q", "__lon_q", "__o", "__nlat", "__nlon")


def total_docs_by_geo(
    docs: DataFrame, cells_col: str = "cells"
) -> DataFrame:
    """(geo, n_docs) over every blocking key a doc lands in — the
    reference's total_docs_by_geo (geo_word_index.py:28-37), a
    flatMap + reduceByKey there, one explode + map-side-combinable
    count agg here."""
    return (
        docs.select(F.explode(cells_col).alias("geo"))
        .groupBy("geo")
        .agg(F.count("*").alias("n_docs"))
    )


def geo_aliases(
    by_geo: DataFrame, min_doc_count: int = 1000, precision: int = 4
) -> DataFrame:
    """Sparse cells alias to their most-populated qualifying neighbor
    (reference geo_word_index.py:19-26): cells under ``min_doc_count``
    join their 8 neighbors against the keep set and take the argmax
    count (geohash string tie-break for determinism; the reference's
    sort is count-only, tie order unspecified). Relational shape: the
    keep set is a HAVING-filtered aggregate (small), neighbor fan-out
    is x8, and the argmax is one max_by — no window, no driver loop."""
    keep = by_geo.filter(F.col("n_docs") >= min_doc_count)
    sparse = by_geo.filter(F.col("n_docs") < min_doc_count)
    # decode the cell back to indices to fan out neighbors: invert the
    # base32 + interleave closed-form (same arithmetic, run in reverse)
    lon_bits, lat_bits = _bits(precision)
    total = 5 * precision
    pos = F.aggregate(
        F.sequence(F.lit(1), F.lit(precision)),
        F.lit(0).cast("long"),
        lambda acc, k: acc * 32
        + (F.instr(F.lit(BASE32), F.substring(F.col("geo"), k.cast("int"), 1)) - 1),
    )
    lon_pos, lat_pos = _positions(total)
    # stage the decode aggregate as a COLUMN before the per-bit sums:
    # each sum term references __pos (a plain attribute), not the
    # F.aggregate tree — inlining the decode into ~5p shift terms is
    # the same expression-tree blowup the encode comment below fixes
    spd = sparse.withColumn("__pos", pos)
    lat_q = sum(
        (
            F.shiftleft(
                F.shiftright(F.col("__pos"), lat_pos(j)).bitwiseAND(F.lit(1)), j
            )
            for j in range(lat_bits)
        ),
        F.lit(0).cast("long"),
    )
    lon_q = sum(
        (
            F.shiftleft(
                F.shiftright(F.col("__pos"), lon_pos(j)).bitwiseAND(F.lit(1)), j
            )
            for j in range(lon_bits)
        ),
        F.lit(0).cast("long"),
    )
    sp = spd.select(
        "geo",
        lat_q.alias("__lat_q"),
        lon_q.alias("__lon_q"),
    )
    # fan out the 8 offsets FIRST via the shared helper (no center —
    # a sparse cell is not its own alias candidate), then encode ONCE
    # on the staged neighbor indices
    fanned = _fan_out_neighbors(sp, precision, include_center=False)
    fan = fanned.select(
        "geo",
        geohash_from_ints(F.col("__nlat"), F.col("__nlon"), precision).alias(
            "neighbor"
        ),
    )
    return (
        fan.join(keep.select(F.col("geo").alias("neighbor"), "n_docs"), "neighbor")
        .groupBy("geo")
        .agg(
            F.max_by(
                F.col("neighbor"), F.struct(F.col("n_docs"), F.col("neighbor"))
            ).alias("alias_geo")
        )
    )
