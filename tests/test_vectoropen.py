"""open_vector driver identification across formats."""
import numpy as np
import pyarrow as pa

from georay.geojson import geometry_to_wkb
from georay.vectoropen import open_vector


def _pts(n=25):
    ids = np.arange(n, dtype=np.int64)
    wkbs = [geometry_to_wkb({"type": "Point",
                             "coordinates": [float(i), float(i % 7)]})
            for i in ids]
    return pa.table({"wkb": pa.array(wkbs, pa.binary()),
                     "fid": pa.array(ids)})


def test_open_vector_formats(tmp_path, ray_session):
    import ray
    t = _pts()

    from georay.shapefile import write_shapefile
    write_shapefile(t, str(tmp_path / "pts"))
    assert open_vector(str(tmp_path / "pts.shp")).count() == 25

    from georay.flatgeobuf import write_fgb
    p = str(tmp_path / "pts.fgb")
    with open(p, "wb") as f:
        f.write(write_fgb(t))
    assert open_vector(p).count() == 25

    from georay.geojson import write_geojson, write_geojsonseq
    p = str(tmp_path / "pts.geojson")
    write_geojson(t, p)
    assert open_vector(p).count() == 25
    p = str(tmp_path / "pts.geojsonl")
    write_geojsonseq(t, p)
    assert open_vector(p).count() == 25

    from georay.arrowipc import write_arrow_ipc
    p = str(tmp_path / "pts.arrow")
    write_arrow_ipc(t, p)
    assert open_vector(p).count() == 25

    import pyarrow.parquet as pq
    p = str(tmp_path / "pts.parquet")
    pq.write_table(t, p)
    assert open_vector(p).count() == 25

    from georay.lancefmt import write_lance
    root = str(tmp_path / "pts.lance")
    write_lance(t, root)
    assert open_vector(root).count() == 25

    import pytest
    bad = str(tmp_path / "x.unknown")
    with open(bad, "wb") as f:
        f.write(b"zzzz")
    with pytest.raises(ValueError):
        open_vector(bad)


def test_geoparquet_metadata_roundtrip(tmp_path):
    """write_vector(.parquet) stamps the GeoParquet 1.1 'geo' key
    (ogrparquetlayer.cpp:87 reads kv_metadata['geo'] the same way)."""
    import pyarrow.parquet as pq

    from georay.geom import wkb_point, wkb_polygon
    from georay.vectoropen import geoparquet_metadata, write_vector

    t = pa.table({"name": ["a", "b", "c"],
                  "wkb": pa.array(
                      [wkb_point(2.0, 3.0),
                       wkb_polygon([[(0, 0), (1, 0), (1, 1), (0, 1)]]),
                       None], pa.binary())})
    p = str(tmp_path / "geo.parquet")
    write_vector(t, p)
    m = geoparquet_metadata(p)
    assert m["version"] == "1.1.0"
    assert m["primary_column"] == "wkb"
    col = m["columns"]["wkb"]
    assert col["encoding"] == "WKB"
    assert col["bbox"] == [0.0, 0.0, 2.0, 3.0]
    assert col["geometry_types"] == ["Point", "Polygon"]
    # data unchanged by the metadata stamp
    assert pq.read_table(p)["name"].to_pylist() == ["a", "b", "c"]
    # plain (non-geo) parquet reports None
    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "plain.parquet"))
    assert geoparquet_metadata(str(tmp_path / "plain.parquet")) is None


def test_geoparquet_covering_pushdown(tmp_path, ray_session):
    """GeoParquet 1.1 covering bbox column: write stamps the covering
    pointer; read_geoparquet(bbox=...) returns exactly the window rows
    and the row-group statistics make most groups prunable."""
    import pyarrow.parquet as pq

    from georay.geom import wkb_point
    from georay.vectoropen import (geoparquet_metadata, read_geoparquet,
                                   write_geoparquet)

    rng = np.random.default_rng(1)
    xs = np.sort(rng.uniform(-180, 180, 8000))   # spatially coherent
    ys = rng.uniform(-80, 80, 8000)
    t = pa.table({"fid": pa.array(np.arange(8000)),
                  "wkb": pa.array([wkb_point(float(x), float(y))
                                   for x, y in zip(xs, ys)], pa.binary())})
    p = str(tmp_path / "cov.parquet")
    write_geoparquet(t, p, row_group_size=1024)
    m = geoparquet_metadata(p)
    assert m["columns"]["wkb"]["covering"]["bbox"]["xmin"] == \
        ["bbox", "xmin"]
    got = read_geoparquet(p, bbox=(0, -90, 10, 90)).to_pandas()
    exp = ((xs >= 0) & (xs <= 10)).sum()
    assert len(got) == exp
    # pruning evidence: most row groups' bbox.xmin stats miss the window
    pf = pq.ParquetFile(p)
    overlapping = 0
    for i in range(pf.num_row_groups):
        st = pf.metadata.row_group(i).column(2).statistics
        if st.min <= 10 and st.max >= 0:
            overlapping += 1
    assert overlapping <= max(2, pf.num_row_groups // 3)
    # no-bbox read returns everything
    assert read_geoparquet(p).count() == 8000
