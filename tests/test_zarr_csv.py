"""Zarr v2 store + OGR CSV driver analogs (SURVEY §2.1 driver rows:
frmts/zarr/, ogr/ogrsf_frmts/csv/)."""

import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from georay import csvdriver, zarrstore


# ---------------------------------------------------------------------------
# Zarr
# ---------------------------------------------------------------------------

def test_zarr_metadata_and_chunk_files(tmp_path):
    p = str(tmp_path / "a.zarr")
    zarrstore.zarr_create(p, (10, 12), (4, 5), "<f8")
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["zarr_format"] == 2
    assert meta["dtype"] == "<f8"
    assert meta["compressor"] == {"id": "zlib", "level": 1}
    a = np.arange(20, dtype=np.float64).reshape(4, 5)
    zarrstore.zarr_write_chunk(p, (0, 0), a)
    # spec: chunk file named "0.0", zlib of C-order raw
    raw = zlib.decompress(open(os.path.join(p, "0.0"), "rb").read())
    np.testing.assert_array_equal(
        np.frombuffer(raw, "<f8").reshape(4, 5), a)


def test_zarr_roundtrip_with_edge_padding(tmp_path):
    p = str(tmp_path / "b.zarr")
    rng = np.random.default_rng(0)
    full = rng.uniform(size=(10, 12))
    meta = zarrstore.zarr_create(p, (10, 12), (4, 5), "<f8",
                                 fill_value=-1.0)
    for cy in range(3):
        for cx in range(3):
            tile = full[cy * 4:(cy + 1) * 4, cx * 5:(cx + 1) * 5]
            zarrstore.zarr_write_chunk(p, (cy, cx), tile, meta)
    np.testing.assert_array_equal(zarrstore.zarr_read(p), full)
    # edge chunk file holds fill padding to the full chunk shape
    edge = zarrstore.zarr_read_chunk(p, (2, 2))
    assert edge.shape == (4, 5)
    assert (edge[2:, :] == -1.0).all()


def test_zarr_windowed_read_touches_needed_chunks_only(tmp_path):
    p = str(tmp_path / "c.zarr")
    full = np.arange(100, dtype=np.int32).reshape(10, 10)
    meta = zarrstore.zarr_create(p, (10, 10), (4, 4), "<i4",
                                 compressor=None)
    for cy in range(3):
        for cx in range(3):
            zarrstore.zarr_write_chunk(
                p, (cy, cx), full[cy * 4:cy * 4 + 4, cx * 4:cx * 4 + 4],
                meta)
    win = zarrstore.zarr_read_window(p, (slice(2, 7), slice(5, 9)))
    np.testing.assert_array_equal(win, full[2:7, 5:9])
    # missing chunk reads as fill_value
    os.remove(os.path.join(p, "0.0"))
    assert (zarrstore.zarr_read_window(p, (slice(0, 2), slice(0, 2)))
            == 0).all()


def test_zarr_ray_source_sink_resume(ray_session, tmp_path):
    import ray

    rng = np.random.default_rng(1)
    full = rng.integers(0, 255, size=(64, 96), dtype=np.uint8)
    rows = []
    for cy in range(2):
        for cx in range(3):
            t = full[cy * 32:(cy + 1) * 32, cx * 32:(cx + 1) * 32]
            rows.append({"c0": cy, "c1": cx, "h": 32, "w": 32,
                         "data": t.tobytes()})
    ds = ray.data.from_items(rows)
    p = str(tmp_path / "d.zarr")
    man = zarrstore.dataset_to_zarr(ds, p, (64, 96), (32, 32),
                                    "|u1").to_pandas()
    assert man["written"].all()
    np.testing.assert_array_equal(zarrstore.zarr_read(p), full)
    # resume: second run skips every complete chunk
    man2 = zarrstore.dataset_to_zarr(ds, p, (64, 96), (32, 32),
                                     "|u1").to_pandas()
    assert not man2["written"].any()
    # source: chunk-parallel read reassembles the array
    back = zarrstore.zarr_to_dataset(p).to_pandas()
    assert len(back) == 6
    got = np.zeros_like(full)
    for _, r in back.iterrows():
        a = np.frombuffer(r["data"], np.uint8).reshape(r["h"], r["w"])
        got[r["c0"] * 32:r["c0"] * 32 + r["h"],
            r["c1"] * 32:r["c1"] * 32 + r["w"]] = a
    np.testing.assert_array_equal(got, full)


# ---------------------------------------------------------------------------
# CSV driver
# ---------------------------------------------------------------------------

def test_csv_wkt_roundtrip(tmp_path):
    csv = (b"WKT,name,v\n"
           b'"POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",alpha,1\n'
           b'"POINT (3.5 -1.25)",beta,2\n')
    t = csvdriver.read_csv_vector(csv)
    assert t.schema.names == ["name", "v", "wkb"]
    # geometry parses to real WKB the engine understands
    gt = struct.unpack_from("<I", t["wkb"][0].as_py(), 1)[0]
    assert gt == 3
    # write back → WKT column leads, values preserved
    out = str(tmp_path / "o.csv")
    csvdriver.write_csv_vector(t, out)
    t2 = csvdriver.read_csv_vector(out)
    assert t2["wkb"].to_pylist() == t["wkb"].to_pylist()
    assert t2["name"].to_pylist() == ["alpha", "beta"]


def test_csv_xy_points():
    csv = b"id,lon,lat\n1,10.5,45.25\n2,-3.0,0.5\n"
    t = csvdriver.read_csv_vector(csv)
    assert "wkb" in t.schema.names
    x, y = struct.unpack_from("<dd", t["wkb"][0].as_py(), 5)
    assert (x, y) == (10.5, 45.25)


def test_csv_ray_source(ray_session, tmp_path):
    p = str(tmp_path / "pts.csv")
    n = 1000
    ids = np.arange(n)
    with open(p, "w") as f:
        f.write("id,x,y\n")
        for i in ids:
            f.write(f"{i},{i * 0.1},{i * -0.2}\n")
    ds = csvdriver.read_csv_vector_dataset(p)
    df = ds.to_pandas()
    assert len(df) == n
    x, y = struct.unpack_from("<dd", df["wkb"].iloc[5], 5)
    assert abs(x - 0.5) < 1e-12 and abs(y + 1.0) < 1e-12


from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=20, deadline=None)
@given(hst.integers(1, 40), hst.integers(1, 40), hst.integers(1, 17),
       hst.integers(1, 17), hst.sampled_from(["<f8", "<i4", "|u1", "<u2"]),
       hst.sampled_from(["zlib", None]))
def test_zarr_property_roundtrip(tmp_path_factory, h, w, ch, cw, dtype,
                                 comp):
    """Any (shape, chunk, dtype, codec) combination roundtrips exactly,
    including edge padding and windowed reads."""
    p = str(tmp_path_factory.mktemp("z") / "a.zarr")
    rng = np.random.default_rng(h * 41 + w)
    if dtype == "<f8":
        full = rng.uniform(-10, 10, (h, w))
    else:
        info = np.iinfo(np.dtype(dtype))
        full = rng.integers(info.min, min(info.max, 10_000) + 1, (h, w))
    full = full.astype(np.dtype(dtype))
    meta = zarrstore.zarr_create(p, (h, w), (ch, cw), dtype,
                                 compressor=comp)
    for cy in range((h + ch - 1) // ch):
        for cx in range((w + cw - 1) // cw):
            zarrstore.zarr_write_chunk(
                p, (cy, cx),
                full[cy * ch:(cy + 1) * ch, cx * cw:(cx + 1) * cw], meta)
    np.testing.assert_array_equal(zarrstore.zarr_read(p), full)
    y0, y1 = sorted(rng.integers(0, h + 1, 2))
    x0, x1 = sorted(rng.integers(0, w + 1, 2))
    if y1 > y0 and x1 > x0:
        np.testing.assert_array_equal(
            zarrstore.zarr_read_window(p, (slice(y0, y1), slice(x0, x1))),
            full[y0:y1, x0:x1])


# ---------------------------------------------------------------------------
# MDArray (gdalmultidim analog over the zarr store)
# ---------------------------------------------------------------------------

def test_mdarray_views_and_distributed_stats(ray_session, tmp_path):
    from georay.mdim import MDArray

    rng = np.random.default_rng(7)
    full = rng.uniform(-5, 5, (50, 70))
    p = str(tmp_path / "m.zarr")
    meta = zarrstore.zarr_create(p, (50, 70), (16, 16), "<f8")
    for cy in range(4):
        for cx in range(5):
            zarrstore.zarr_write_chunk(
                p, (cy, cx),
                full[cy * 16:(cy + 1) * 16, cx * 16:(cx + 1) * 16], meta)
    a = MDArray(p, dim_names=["y", "x"])
    assert a.shape == (50, 70) and a.dims == ["y", "x"]
    np.testing.assert_array_equal(a.read(), full)
    # composed views are windowed reads
    v = a.view(slice(5, 40), slice(10, 60)).view(slice(2, 30),
                                                 slice(0, 45))
    np.testing.assert_array_equal(v.read(), full[7:35, 10:55])
    # distributed reductions == numpy on the same window
    assert v.reduce("count") == v.read().size
    np.testing.assert_allclose(v.reduce("sum"), full[7:35, 10:55].sum(),
                               rtol=1e-12)
    np.testing.assert_allclose(v.reduce("min"), full[7:35, 10:55].min())
    np.testing.assert_allclose(v.reduce("max"), full[7:35, 10:55].max())
    st = v.statistics()
    win = full[7:35, 10:55]
    assert st.count == win.size
    np.testing.assert_allclose(st.mean, win.mean(), rtol=1e-12)
    np.testing.assert_allclose(st.std, win.std(), rtol=1e-9)


def test_mdim_translate_rechunk_and_window(ray_session, tmp_path):
    """gdalmdimtranslate analog: window + re-chunk onto a different chunk
    grid through the explode->groupby->assemble shuffle; values exact."""
    from georay.mdim import mdim_translate

    rng = np.random.default_rng(11)
    full = rng.integers(0, 10_000, (57, 83)).astype("<i4")
    src = str(tmp_path / "src.zarr")
    meta = zarrstore.zarr_create(src, (57, 83), (16, 16), "<i4")
    for cy in range((57 + 15) // 16):
        for cx in range((83 + 15) // 16):
            zarrstore.zarr_write_chunk(
                src, (cy, cx),
                full[cy * 16:(cy + 1) * 16, cx * 16:(cx + 1) * 16], meta)
    # identity re-chunk onto a coarser, misaligned grid
    dst = str(tmp_path / "dst.zarr")
    mdim_translate(src, dst, chunks=(25, 21))
    np.testing.assert_array_equal(zarrstore.zarr_read(dst), full)
    # window + re-chunk + dtype change
    dst2 = str(tmp_path / "dst2.zarr")
    mdim_translate(src, dst2, window=(slice(5, 50), slice(10, 70)),
                   chunks=(13, 17), dtype="<f8")
    out = zarrstore.zarr_read(dst2)
    assert out.dtype == np.dtype("<f8")
    np.testing.assert_array_equal(out, full[5:50, 10:70].astype("<f8"))


def test_zarr_3d_core(tmp_path):
    """The zarr core (create/write_chunk/read_window/read) is N-D; the
    Ray source/sink specialize to 2-D — pin the 3-D core so the N-D
    claim stays true."""
    p = str(tmp_path / "v.zarr")
    rng = np.random.default_rng(4)
    full = rng.integers(0, 200, (6, 20, 30)).astype("|u1")
    meta = zarrstore.zarr_create(p, (6, 20, 30), (2, 8, 16), "|u1")
    for c0 in range(3):
        for c1 in range(3):
            for c2 in range(2):
                zarrstore.zarr_write_chunk(
                    p, (c0, c1, c2),
                    full[c0 * 2:(c0 + 1) * 2, c1 * 8:(c1 + 1) * 8,
                         c2 * 16:(c2 + 1) * 16], meta)
    np.testing.assert_array_equal(zarrstore.zarr_read(p), full)
    win = zarrstore.zarr_read_window(
        p, (slice(1, 5), slice(3, 17), slice(10, 28)))
    np.testing.assert_array_equal(win, full[1:5, 3:17, 10:28])
    # chunk grid enumerates all 18 chunks in C order
    assert len(zarrstore.zarr_chunk_grid(meta)) == 18


def test_mdarray_strided_views(ray_session, tmp_path):
    """Strided GetView (VERDICT r3 next-7): composed strided slices
    through the Ray path equal numpy slicing on the full array."""
    from georay.mdim import MDArray

    rng = np.random.default_rng(13)
    full = rng.uniform(-9, 9, (47, 61))
    p = str(tmp_path / "sv.zarr")
    meta = zarrstore.zarr_create(p, (47, 61), (16, 13), "<f8")
    for cy in range(3):
        for cx in range(5):
            zarrstore.zarr_write_chunk(
                p, (cy, cx),
                full[cy * 16:(cy + 1) * 16, cx * 13:(cx + 1) * 13], meta)
    a = MDArray(p)
    v = a.view(slice(3, 44, 5), slice(2, 60, 7))
    want = full[3:44:5, 2:60:7]
    assert v.shape == want.shape
    np.testing.assert_array_equal(v.read(), want)
    # composition of strided views == composed numpy slicing
    v2 = v.view(slice(1, None, 2), slice(0, 5, 3))
    want2 = want[1::2, 0:5:3]
    assert v2.shape == want2.shape
    np.testing.assert_array_equal(v2.read(), want2)
    # distributed reductions agree on the strided window
    assert v2.reduce("count") == want2.size
    np.testing.assert_allclose(v2.reduce("sum"), want2.sum(), rtol=1e-12)
    np.testing.assert_allclose(v2.reduce("min"), want2.min())
    st = v.statistics()
    assert st.count == want.size
    np.testing.assert_allclose(st.mean, want.mean(), rtol=1e-12)
    with pytest.raises(ValueError):
        a.view(slice(None, None, -1), slice(None))


@given(
    y0=hst.integers(0, 20), ys=hst.integers(1, 7),
    x0=hst.integers(0, 20), xs=hst.integers(1, 7),
)
@settings(max_examples=25, deadline=None)
def test_mdarray_strided_view_hypothesis(y0, ys, x0, xs):
    """Hypothesis: any (start, step) view equals numpy slicing."""
    import tempfile

    from georay.mdim import MDArray

    full = (np.arange(41 * 37, dtype=np.int64).reshape(41, 37) * 7) % 1000
    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/h.zarr"
        meta = zarrstore.zarr_create(p, (41, 37), (11, 9), "<i8")
        for cy in range(4):
            for cx in range(5):
                zarrstore.zarr_write_chunk(
                    p, (cy, cx),
                    full[cy * 11:(cy + 1) * 11, cx * 9:(cx + 1) * 9],
                    meta)
        v = MDArray(p).view(slice(y0, None, ys), slice(x0, None, xs))
        np.testing.assert_array_equal(v.read(), full[y0::ys, x0::xs])


def test_mdim_translate_3d(ray_session, tmp_path):
    """N-D mdim_translate (VERDICT r3 next-7): 3-D window + re-chunk +
    dtype change through the explode→groupby→assemble shuffle, exact."""
    from georay.mdim import mdim_translate

    rng = np.random.default_rng(17)
    full = rng.integers(0, 250, (9, 34, 27)).astype("|u1")
    src = str(tmp_path / "s3.zarr")
    meta = zarrstore.zarr_create(src, (9, 34, 27), (4, 16, 16), "|u1")
    for cz in range(3):
        for cy in range(3):
            for cx in range(2):
                zarrstore.zarr_write_chunk(
                    src, (cz, cy, cx),
                    full[cz * 4:(cz + 1) * 4, cy * 16:(cy + 1) * 16,
                         cx * 16:(cx + 1) * 16], meta)
    # identity re-chunk, misaligned grid
    dst = str(tmp_path / "d3.zarr")
    mdim_translate(src, dst, chunks=(5, 10, 11))
    np.testing.assert_array_equal(zarrstore.zarr_read(dst), full)
    # window + re-chunk + dtype widening
    dst2 = str(tmp_path / "d3b.zarr")
    mdim_translate(src, dst2, window=(slice(1, 8), slice(3, 30),
                                      slice(5, 25)),
                   chunks=(3, 9, 8), dtype="<f4")
    out = zarrstore.zarr_read(dst2)
    assert out.dtype == np.dtype("<f4")
    np.testing.assert_array_equal(out, full[1:8, 3:30, 5:25]
                                  .astype("<f4"))
