"""Sources/sinks: schema enforcement, manifest round-trip, REST sink with
injected transport, GeoTIFF export stub, resume-state derivation."""

from __future__ import annotations

import datetime as dt
import io
import json
import os

import numpy as np
import pytest
from pyspark.sql.types import StructType

from lswms_forage_etl_spark import schemas
from lswms_forage_etl_spark.sources import (
    geotiff_export,
    read_csv_strict,
    read_manifest,
    read_raster_cells,
    rest_post_sink,
    scan_raster_filenames,
    write_legacy_csv,
    write_manifest,
    write_partitioned,
)
from lswms_forage_etl_spark.streaming import resume_start_date

D1, D2 = dt.date(2024, 1, 16), dt.date(2024, 2, 1)


def _cells(spark):
    rows = [(D1, 0, 0, 1.5), (D1, 0, 1, -99999.0), (D2, 1, 1, 3.25)]
    return spark.createDataFrame(rows, schemas.RASTER_CELLS)


def test_csv_strict_schema(spark, tmp_path):
    p = str(tmp_path / "pts.csv")
    with open(p, "w") as fh:
        fh.write("lon,lat\n36.1234,14.5678\nnot_a_number,1.0\n")
    df = read_csv_strict(spark, p, StructType(
        [schemas.POINT_SAMPLE["lon"], schemas.POINT_SAMPLE["lat"]]))
    rows = df.collect()
    assert rows[0]["lon"] == 36.1234
    assert rows[1]["lon"] is None  # malformed -> NULL, not inference


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "raster")
    write_partitioned(_cells(spark), path)
    back = read_raster_cells(spark, path, start=D2)
    rows = back.collect()
    assert len(rows) == 1 and rows[0]["value"] == 3.25
    # sentinel masked on ingest
    all_rows = read_raster_cells(spark, path).collect()
    vals = {(r["row"], r["col"]): r["value"] for r in all_rows}
    assert vals[(0, 1)] is None


def test_legacy_csv_single_file(spark, tmp_path):
    path = str(tmp_path / "legacy")
    write_legacy_csv(_cells(spark).select("row", "col", "value"), path)
    parts = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(parts) == 1


def test_manifest_roundtrip_and_empty_guard(spark, tmp_path):
    p = str(tmp_path / "m" / "new_data_list_FINAL.txt")
    df = spark.createDataFrame([("a.tif",), ("b.tif",)], "filename string")
    assert write_manifest(df, p) == 2
    back = read_manifest(spark, p)
    assert {r["filename"] for r in back.collect()} == {"a.tif", "b.tif"}
    empty = spark.createDataFrame([], "filename string")
    p2 = str(tmp_path / "m" / "empty.txt")
    assert write_manifest(empty, p2) == 0
    assert read_manifest(spark, p2).isEmpty()


def test_rest_post_sink_batches(spark, tmp_path):
    out_dir = tmp_path / "posts"
    out_dir.mkdir()

    def transport(url, headers, batch):
        # executor-side capture: one file per call (local[.] = same fs)
        import uuid
        assert headers["Authorization"] == "Bearer tok"
        with open(out_dir / f"{uuid.uuid4().hex}.json", "w") as fh:
            json.dump(batch, fh)
        return 201

    df = spark.createDataFrame(
        [(1, 2.5, None), (2, None, "x"), (3, 1.0, "y")],
        "id int, v double, s string").repartition(2)
    n = rest_post_sink(df, "http://api/bulk", "tok", transport, batch_size=2,
                       round_cols={"v": 4})
    assert n == {"delivered": 3, "failed": 0}
    rows = []
    for f in os.listdir(out_dir):
        rows += json.load(open(out_dir / f))
    assert len(rows) == 3
    byid = {r["id"]: r for r in rows}
    # NULL -> absent/null in JSON (reference NaN->None)
    assert "v" not in byid[2] or byid[2]["v"] is None
    # failed POSTs are reported, not folded into the success count
    n = rest_post_sink(df, "http://api/bulk", "tok",
                       lambda u, h, b: 503, batch_size=2)
    assert n == {"delivered": 0, "failed": 3}


def test_geotiff_export_stub(spark, tmp_path):
    out = str(tmp_path / "tifs")
    cells = spark.createDataFrame(
        [(D1, 0, 0, 5.0), (D1, 299, 259, 7.0)], schemas.RASTER_CELLS)
    man = geotiff_export(cells, out, fake=True).collect()
    assert man[0]["n_valid"] == 2
    grid = np.fromfile(os.path.join(out, "biomass_20240116.bin"),
                       dtype=np.float32).reshape(300, 260)
    assert grid[0, 0] == 5.0 and grid[299, 259] == 7.0
    assert grid[5, 5] == schemas.RASTER_NODATA
    hdr = json.load(open(os.path.join(out, "biomass_20240116.json")))
    assert hdr["crs"] == "EPSG:4326" and hdr["nodata"] == -99999.0


def test_geotiff_export_real_roundtrip(spark, tmp_path):
    """VERDICT r1 #4: the sink writes a real strip TIFF that the engine's
    own reader (the reference-layout spec) decodes to identical cells."""
    from lswms_forage_etl_spark.sources.geotiff import read_geotiff

    out = str(tmp_path / "tifs")
    cells = spark.createDataFrame(
        [(D1, 0, 0, 5.0), (D1, 299, 259, 7.0), (D1, 10, 20, 1.25)],
        schemas.RASTER_CELLS)
    man = {r["filename"]: r["n_valid"]
           for r in geotiff_export(cells, out).collect()}
    assert man == {"biomass_20240116.tif": 3}
    arr, (olon, olat, sx), nd = read_geotiff(
        os.path.join(out, "biomass_20240116.tif"))
    assert arr.shape == (300, 260)
    assert nd == schemas.RASTER_NODATA
    assert (olon, olat, sx) == (schemas.GRID_ORIGIN_LON,
                                schemas.GRID_ORIGIN_LAT,
                                schemas.GRID_CELL_DEG)
    assert arr[0, 0] == 5.0 and arr[299, 259] == 7.0 and arr[10, 20] == 1.25
    # nodata cells come back masked to NaN, matching the scan-side F5 rule
    assert np.isnan(arr[5, 5])
    assert np.isnan(arr).sum() == 300 * 260 - 3


def test_bucketed_join_no_shuffle(spark):
    """Two tables bucketed+sorted on the join key must sort-merge-join
    with ZERO Exchange operators — the co-location contract that removes
    the dominant shuffle from fact-to-fact joins at scale."""
    from lswms_forage_etl_spark.sources import write_bucketed

    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bt_a", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bt_b", ["k"], num_buckets=8, sort_cols=["k"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bt_a").join(spark.table("bt_b"), "k")
            assert j.count() == 1000
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan          # co-located: no shuffle
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_geoserver_publisher_call_sequence(tmp_path):
    """S16 (tools.py:70-139, import_biomass.py:55-76): create-on-first-
    contact then harvest, zip = raster + exactly 2 properties files,
    time dimension enabled right after create."""
    from lswms_forage_etl_spark.sources.geoserver import (
        GeoServerPublisher,
        build_mosaic_zip,
    )
    import zipfile as zf

    props = tmp_path / "props"
    props.mkdir()
    (props / "indexer.properties").write_text("TimeAttribute=time\n")
    (props / "timeregex.properties").write_text("regex=[0-9]{8}\n")
    r1 = tmp_path / "biomass_20240101.tif"
    r2 = tmp_path / "biomass_20240117.tif"
    r1.write_bytes(b"t1")
    r2.write_bytes(b"t2")

    payload = build_mosaic_zip(str(r1), str(props))
    assert sorted(zf.ZipFile(io.BytesIO(payload)).namelist()) == [
        "biomass_20240101.tif", "indexer.properties", "timeregex.properties"]

    calls = []
    stores: set[str] = set()

    def fake_transport(method, url, payload):
        calls.append((method, url.split("/geoserver/rest/", 1)[1]))
        if method == "GET":
            return (200, "ok") if "biomass_et" in stores else (404, "absent")
        if method == "POST" and url.endswith("file.imagemosaic"):
            stores.add("biomass_et")
        return 201, "created"

    pub = GeoServerPublisher("http://gs/geoserver/rest", "waterpoints_et",
                             fake_transport)
    counts = pub.publish("biomass_et", [str(r1), str(r2)], str(props))
    assert counts == {"created": 1, "updated": 1}
    base = "workspaces/waterpoints_et/coveragestores/biomass_et"
    assert calls == [
        ("GET", f"{base}.xml"),                            # store probe
        ("POST", f"{base}/file.imagemosaic"),              # create mosaic
        ("PUT", f"{base}/coverages/biomass_et.xml"),       # enable time
        ("GET", f"{base}.xml"),                            # store probe
        ("POST", f"{base}/file.imagemosaic?recalculate="),  # harvest
    ]

    # exactly-2-properties guard (zip_files aborts otherwise)
    (props / "extra.properties").write_text("x\n")
    with pytest.raises(ValueError):
        build_mosaic_zip(str(r1), str(props))

    # non-2xx from the server surfaces, never silent success
    bad = GeoServerPublisher("http://gs/geoserver/rest", "ws",
                             lambda m, u, p: (500, "boom"))
    with pytest.raises(RuntimeError):
        bad.create_mosaic("s", payload)


def test_scan_filenames_and_resume(spark, tmp_path):
    d = tmp_path / "rasters"
    d.mkdir()
    for name in ("biomass_20240101.tif", "biomass_20240117.tif", "junk.txt"):
        (d / name).touch()
    listing = scan_raster_filenames(spark, str(d))
    assert listing.count() == 2
    nxt = resume_start_date(spark, str(d))
    assert nxt == dt.date(2024, 1, 18)
    # empty dir -> default; override wins
    e = tmp_path / "empty"
    e.mkdir()
    assert resume_start_date(spark, str(e), default=dt.date(2020, 1, 1)) == \
        dt.date(2020, 1, 1)
    assert resume_start_date(spark, str(d), override=dt.date(2021, 2, 3)) == \
        dt.date(2021, 2, 3)
