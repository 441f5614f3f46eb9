"""NetCDF-3 classic codec (georay.netcdf) — from-scratch reader/writer
pinned against HAND-BUILT spec bytes (no netcdf lib in this container;
same verification pattern as the SQLite reader's byte-level pins),
plus roundtrips and the distributed netCDF → Zarr → MDArray path."""

import struct

import numpy as np
import pytest

from georay import netcdf as nc


def _hand_built_file():
    """A CDF-1 file written token-by-token from the published spec:
    dims (time=UNLIMITED, x=3), one global att, one fixed var lon(x)
    float32, one record var t(time, x) int16."""
    def name(s):
        b = s.encode()
        return struct.pack(">i", len(b)) + b + b"\x00" * (-len(b) % 4)

    hdr = b"CDF\x01"
    hdr += struct.pack(">i", 2)                      # numrecs = 2
    hdr += struct.pack(">ii", 0x0A, 2)               # NC_DIMENSION, 2
    hdr += name("time") + struct.pack(">i", 0)       # record dim
    hdr += name("x") + struct.pack(">i", 3)
    # one global attribute: title = "hi"
    hdr += struct.pack(">ii", 0x0C, 1)
    hdr += name("title") + struct.pack(">ii", 2, 2) + b"hi\x00\x00"
    # two variables
    hdr += struct.pack(">ii", 0x0B, 2)
    # lon(x): float32, no atts
    var_lon = name("lon") + struct.pack(">i", 1) + struct.pack(">i", 1)
    var_lon += struct.pack(">ii", 0, 0)              # no atts
    var_lon += struct.pack(">ii", 5, 12)             # NC_FLOAT, vsize 12
    # t(time, x): int16 → per-record 6 bytes, padded vsize 8
    var_t = name("t") + struct.pack(">i", 2) + struct.pack(">ii", 0, 1)
    var_t += struct.pack(">ii", 0, 0)
    var_t += struct.pack(">ii", 3, 8)                # NC_SHORT, vsize 8
    # begins: lon data right after header; t after lon
    header_len = (len(hdr) + len(var_lon) + 4 + len(var_t) + 4)
    lon_begin = header_len
    t_begin = lon_begin + 12
    hdr += var_lon + struct.pack(">i", lon_begin)
    hdr += var_t + struct.pack(">i", t_begin)
    body = np.array([10.0, 20.0, 30.0], ">f4").tobytes()
    # SINGLE record var: records pack WITHOUT padding (recsize = 6)
    body += np.array([[1, 2, 3], [4, 5, 6]], ">i2").tobytes()
    return hdr + body


def test_reader_on_hand_built_spec_bytes():
    data = _hand_built_file()
    meta = nc.nc_meta(data)
    assert meta["version"] == 1 and meta["numrecs"] == 2
    assert meta["dims"] == [("time", 0), ("x", 3)]
    assert meta["gatts"]["title"] == "hi"
    assert set(meta["vars"]) == {"lon", "t"}
    assert meta["vars"]["lon"]["record"] is False
    assert meta["vars"]["t"]["record"] is True
    assert meta["recsize"] == 6                     # single record var
    np.testing.assert_array_equal(nc.nc_read_var(data, "lon"),
                                  np.array([10, 20, 30], "f4"))
    np.testing.assert_array_equal(nc.nc_read_var(data, "t"),
                                  np.array([[1, 2, 3], [4, 5, 6]], "i2"))
    # record-range read (the distributed unit)
    np.testing.assert_array_equal(
        nc.nc_read_var(data, "t", rec0=1, rec1=2),
        np.array([[4, 5, 6]], "i2"))


def test_writer_reader_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 7).astype(np.float32)
    grid = rng.integers(-3000, 3000, (5, 4, 7)).astype(np.int16)
    temp = rng.uniform(-40, 40, (5, 7)).astype(np.float64)
    data = nc.nc_write(
        dims=[("time", 0), ("lev", 4), ("x", 7)],
        variables={
            "lon": (["x"], lon),
            "grid": (["time", "lev", "x"], grid),
            "temp": (["time", "x"], temp),
        },
        gatts={"title": "roundtrip", "version": np.array([3],
                                                         np.int32)})
    meta = nc.nc_meta(data)
    assert meta["numrecs"] == 5
    np.testing.assert_array_equal(nc.nc_read_var(data, "lon"), lon)
    np.testing.assert_array_equal(nc.nc_read_var(data, "grid"), grid)
    np.testing.assert_array_equal(nc.nc_read_var(data, "temp"), temp)
    # two record vars → recsize includes padding of both
    assert meta["recsize"] == (4 * 7 * 2) + (7 * 8)


def test_nc4_rejected():
    with pytest.raises(NotImplementedError):
        nc.nc_meta(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
        nc.nc_meta(b"JUNKJUNK")


def test_netcdf_to_zarr_and_mdarray(ray_session, tmp_path):
    """Distributed conversion: record slabs → Zarr chunks; the MDArray
    surface (windowed + strided reads, distributed stats) then applies."""
    from georay.mdim import MDArray
    from georay.zarrstore import zarr_read

    rng = np.random.default_rng(9)
    grid = rng.uniform(-5, 5, (40, 6, 9)).astype(np.float64)
    data = nc.nc_write(
        dims=[("time", 0), ("y", 6), ("x", 9)],
        variables={"v": (["time", "y", "x"], grid)})
    p = str(tmp_path / "f.nc")
    with open(p, "wb") as f:
        f.write(data)
    zp = str(tmp_path / "v.zarr")
    nc.netcdf_to_zarr(p, zp, "v", chunks=(7, 6, 9))
    np.testing.assert_array_equal(zarr_read(zp), grid)
    a = MDArray(zp, dim_names=["time", "y", "x"])
    v = a.view(slice(3, 33, 3), slice(0, 6), slice(1, None, 2))
    want = grid[3:33:3, :, 1::2]
    np.testing.assert_array_equal(v.read(), want)
    st = v.statistics()
    assert st.count == want.size
    np.testing.assert_allclose(st.mean, want.mean(), rtol=1e-12)


def test_read_netcdf_dataset(ray_session, tmp_path):
    rng = np.random.default_rng(2)
    grid = rng.integers(0, 100, (12, 5)).astype(np.int32)
    data = nc.nc_write(dims=[("time", 0), ("x", 5)],
                       variables={"v": (["time", "x"], grid)})
    p = str(tmp_path / "d.nc")
    with open(p, "wb") as f:
        f.write(data)
    ds = nc.read_netcdf_dataset(p, "v")
    rows = ds.to_pandas().sort_values("rec0")
    got = np.concatenate([
        np.frombuffer(r["data"], np.int32).reshape(r["shape"])
        for _, r in rows.iterrows()])
    np.testing.assert_array_equal(got, grid)


def test_cdf5_roundtrip_64bit():
    """CDF-5 (64-bit data format): every NON_NEG widens to INT64 and
    the int64/unsigned types become storable; CDF-1 output unchanged."""
    import numpy as np
    import pytest

    from georay.netcdf import nc_meta, nc_read_var, nc_write
    dims = [("t", 0), ("y", 4), ("x", 5)]
    rng = np.random.default_rng(5)
    v64 = rng.integers(-2**40, 2**40, size=(3, 4, 5)).astype(np.int64)
    u16 = rng.integers(0, 65535, size=(3, 4, 5)).astype(np.uint16)
    vf = rng.random((4, 5)).astype(np.float64)
    data = nc_write(dims, {"big": (["t", "y", "x"], v64),
                           "fixed": (["y", "x"], vf),
                           "u": (["t", "y", "x"], u16)},
                    gatts={"title": "cdf5"}, version=5)
    assert data[:4] == b"CDF\x05"
    m = nc_meta(data)
    assert m["version"] == 5 and m["numrecs"] == 3
    assert m["gatts"]["title"] == "cdf5"
    assert np.array_equal(nc_read_var(data, "big"), v64)
    assert np.array_equal(nc_read_var(data, "fixed"), vf)
    assert np.array_equal(nc_read_var(data, "u"), u16)
    # record-range read still slices records
    assert np.array_equal(nc_read_var(data, "big", rec0=1, rec1=3),
                          v64[1:3])
    # int64 payloads refuse CDF-1
    with pytest.raises(ValueError, match="CDF-5"):
        nc_write([("y", 2)], {"a": (["y"], v64[0, 0, :2])}, version=1)
