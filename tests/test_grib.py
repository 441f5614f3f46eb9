"""GRIB2 driver (georay.grib): spec-pinned reader, roundtrips, bitmap,
scanning modes, Ray source."""
import struct

import numpy as np
import pytest

from georay import grib


def _hand_message() -> bytes:
    """A GRIB2 message built BYTE-BY-BYTE from the WMO spec tables,
    independently of the module's writer: 3×2 regular lat/lon grid,
    template 3.0 / 4.0 / 5.0 (simple packing), D=1, R=15, E=0, 5 bits.
    X = [0,5,10,15,20,25] → Y = [1.5, 2.0, 2.5, 3.0, 3.5, 4.0]."""
    def sec(num, body):
        return struct.pack(">IB", 5 + len(body), num) + body

    sec1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 7, 0, 2, 1, 0,
                              2020, 6, 15, 12, 0, 0, 0, 1))
    # template 3.0, octets 15..72 (58 bytes)
    t3 = (bytes([6])                       # 15 shape of earth: sphere
          + bytes([0xFF]) + b"\xff" * 4    # 16-20 radius: missing
          + bytes([0xFF]) + b"\xff" * 4    # 21-25 major: missing
          + bytes([0xFF]) + b"\xff" * 4    # 26-30 minor: missing
          + struct.pack(">I", 3)           # 31-34 Ni
          + struct.pack(">I", 2)           # 35-38 Nj
          + struct.pack(">II", 0, 0)       # 39-46 basic angle/subdiv
          + struct.pack(">I", 60_000_000)  # 47-50 La1 = 60°N
          + struct.pack(">I", 10_000_000)  # 51-54 Lo1 = 10°E
          + bytes([0x30])                  # 55 res/component flags
          + struct.pack(">I", 59_000_000)  # 56-59 La2 = 59°N
          + struct.pack(">I", 12_000_000)  # 60-63 Lo2 = 12°E
          + struct.pack(">I", 1_000_000)   # 64-67 Di = 1°
          + struct.pack(">I", 1_000_000)   # 68-71 Dj = 1°
          + bytes([0x00]))                 # 72 scanning: +i, -j
    sec3 = sec(3, struct.pack(">BIBBH", 0, 6, 0, 0, 0) + t3)
    t4 = (bytes([3, 5, 2, 255, 255]) + struct.pack(">H", 0)
          + bytes([255, 1]) + struct.pack(">I", 0)
          + bytes([1, 0]) + struct.pack(">I", 0)
          + bytes([255, 255]) + b"\xff\xff\xff\xff")
    sec4 = sec(4, struct.pack(">HH", 0, 0) + t4)
    sec5 = sec(5, struct.pack(">IH", 6, 0) + struct.pack(">f", 15.0)
               + b"\x00\x00"               # E = 0 (sign-magnitude)
               + b"\x00\x01"               # D = 1
               + bytes([5, 0]))            # 5 bits, float field
    sec6 = sec(6, bytes([255]))
    # X=[0,5,10,15,20,25] at 5 bits → 30 bits → 0x01 0x54 0xFA 0x64
    sec7 = sec(7, bytes([0x01, 0x54, 0xFA, 0x64]))
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    return (b"GRIB\x00\x00" + bytes([0, 2]) + struct.pack(">Q", total)
            + body + b"7777")


def test_reader_decodes_hand_built_spec_message(tmp_path):
    p = str(tmp_path / "hand.grib2")
    with open(p, "wb") as f:
        f.write(_hand_message())
    a, meta = grib.read_grib_message(p)
    np.testing.assert_array_equal(
        a, np.array([[1.5, 2.0, 2.5], [3.0, 3.5, 4.0]]))
    assert meta["lat0"] == 60.0 and meta["lon0"] == 10.0
    assert meta["dlat"] == 1.0 and meta["dlon"] == 1.0
    assert meta["ni"] == 3 and meta["nj"] == 2
    assert meta["category"] == 3 and meta["parameter"] == 5
    idx = grib.scan_grib(p)
    assert len(idx) == 1 and idx[0]["length"] == len(_hand_message())


def test_integer_grid_roundtrips_exactly(tmp_path):
    rng = np.random.RandomState(7)
    a = rng.randint(-300, 4200, (37, 53)).astype(np.float64)
    p = str(tmp_path / "i.grib2")
    grib.write_grib(p, [a], lat0=48.5, lon0=-5.25, dlat=0.1, dlon=0.125)
    back, meta = grib.read_grib_message(p)
    np.testing.assert_array_equal(back, a)
    assert (meta["lat0"], meta["lon0"]) == (48.5, -5.25)
    assert (meta["dlat"], meta["dlon"]) == (0.1, 0.125)


def test_decimal_scale_bounds_error(tmp_path):
    rng = np.random.RandomState(11)
    b = rng.randn(20, 30) * 7.0
    p = str(tmp_path / "f.grib2")
    grib.write_grib(p, [b], lat0=10, lon0=10, dlat=0.5, dlon=0.5,
                    decimal_scale=3)
    back, _ = grib.read_grib_message(p)
    assert np.max(np.abs(back - b)) <= 0.5 * 1e-3 + 1e-12


def test_bitmap_roundtrip(tmp_path):
    a = np.arange(48, dtype=np.float64).reshape(6, 8)
    a[0, 0] = np.nan
    a[3, 2:5] = np.nan
    a[5, 7] = np.nan
    p = str(tmp_path / "bm.grib2")
    grib.write_grib(p, [a], lat0=0, lon0=0, dlat=1, dlon=1)
    back, _ = grib.read_grib_message(p)
    assert np.array_equal(np.isnan(back), np.isnan(a))
    m = ~np.isnan(a)
    np.testing.assert_array_equal(back[m], a[m])


def test_constant_and_multi_message(tmp_path):
    c = np.full((5, 5), 42.0)
    d = np.zeros((3, 3))
    p = str(tmp_path / "m.grib2")
    info = grib.write_grib(p, [c, d], lat0=30, lon0=40, dlat=1, dlon=1)
    assert info["messages"] == 2
    out = grib.read_grib(p)
    np.testing.assert_array_equal(out[0][0], c)
    np.testing.assert_array_equal(out[1][0], d)


def test_south_to_north_scanning_normalized(tmp_path):
    """A j-positive (south→north) message is normalized to north-up on
    read: flip rows + move lat0 to the north edge."""
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "s.grib2")
    grib.write_grib(p, [a], lat0=20.0, lon0=0.0, dlat=1.0, dlon=1.0)
    raw = bytearray(open(p, "rb").read())
    # locate section 3 (starts at 16 + len(sec1)) and patch scanning
    i = 16
    while True:
        ln, num = struct.unpack(">IB", raw[i:i + 5])
        if num == 3:
            break
        i += ln
    scan_off = i + 5 + 9 + 57         # section hdr + pre-template + t[57]
    assert raw[scan_off] == 0x00
    raw[scan_off] = 0x40              # +i, +j (south→north)
    # la1 must now be the SOUTH edge for the same grid
    la1_off = i + 5 + 9 + 32
    south = round((20.0 - 2 * 1.0) * 1e6)
    raw[la1_off:la1_off + 4] = struct.pack(">I", south)
    p2 = str(tmp_path / "s2.grib2")
    open(p2, "wb").write(bytes(raw))
    b, meta = grib.read_grib_message(p2)
    np.testing.assert_array_equal(b, a[::-1])   # rows were reinterpreted
    assert meta["lat0"] == 20.0                 # north edge restored


def test_unsupported_templates_raise(tmp_path):
    msg = bytearray(_hand_message())
    # patch data representation template number (section 5) to 2
    i = 16
    while True:
        ln, num = struct.unpack(">IB", msg[i:i + 5])
        if num == 5:
            break
        i += ln
    msg[i + 5 + 4:i + 5 + 6] = struct.pack(">H", 2)
    p = str(tmp_path / "bad.grib2")
    open(p, "wb").write(bytes(msg))
    with pytest.raises(NotImplementedError, match="5.2"):
        grib.read_grib_message(p)


def test_pack_unpack_bits_property():
    rng = np.random.RandomState(5)
    for nbits in (1, 3, 5, 8, 11, 16, 23, 31):
        x = rng.randint(0, 1 << nbits, 997).astype(np.uint64)
        buf = grib._pack_bits(x, nbits)
        back = grib._unpack_bits(buf, len(x), nbits)
        np.testing.assert_array_equal(back, x.astype(np.int64))


def test_ray_dataset_source(tmp_path, ray_session):
    import pyarrow as pa
    rng = np.random.RandomState(2)
    fields = [rng.randint(0, 100, (16, 64)).astype(np.float64)
              for _ in range(4)]
    p = str(tmp_path / "d.grib2")
    grib.write_grib(p, fields, lat0=90.0, lon0=-180.0,
                    dlat=180.0 / 64, dlon=360.0 / 64)
    ds = grib.read_grib_dataset(p)
    t = pa.concat_tables(list(ds.iter_batches(batch_size=1 << 20,
                                              batch_format="pyarrow")))
    t = t.sort_by("message")
    assert t.num_rows == 4
    for k in range(4):
        flat = np.asarray(t["data"][k].as_py())
        np.testing.assert_array_equal(flat.reshape(16, 64), fields[k])


def test_large_magnitude_reference_float32_exact(tmp_path):
    # R is stored float32 in Section 5: values whose scaled minimum is
    # not float32-representable (>= 2^24) must still roundtrip exactly
    # (ADVICE r4: quantize the reference THROUGH float32 when packing).
    base = 2 ** 24 + 1            # not representable in float32
    a = (base + np.arange(12.0)).reshape(3, 4)
    p = str(tmp_path / "big.grib2")
    grib.write_grib(p, [a], lat0=10.0, lon0=0.0, dlat=1.0, dlon=1.0)
    back, _ = grib.read_grib_message(p)
    np.testing.assert_array_equal(back, a)

    # negative large magnitudes too (float32 rounds toward zero here,
    # i.e. ABOVE the true min -> writer must step down one ulp)
    b = (-base - np.arange(12.0)).reshape(3, 4)
    p2 = str(tmp_path / "bigneg.grib2")
    grib.write_grib(p2, [b], lat0=10.0, lon0=0.0, dlat=1.0, dlon=1.0)
    back2, _ = grib.read_grib_message(p2)
    np.testing.assert_array_equal(back2, b)
