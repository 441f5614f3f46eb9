"""NITF 2.1 driver — minimal profile of the reference's
frmts/nitf/nitfdataset.cpp, re-implemented from scratch against the
public MIL-STD-2500C field tables (reproduced below as explicit
(name, width) rows so the structure is auditable line-by-line).

Scope (honest subset): NITF02.10 / BF01 files with image segments
only; uncompressed pixels (IC=NC), IMODE P (band-interleaved by
pixel) or B, single- OR multi-block (NBPR×NBPC row-major block grid,
right/bottom blocks zero-padded to NPPBH×NPPBV per the spec; the
multiband-IMODE-B multi-block ordering variant is not emitted and is
rejected on read), 8- or 16-bit integer samples (big-endian per the
spec), optional ICORDS='D' decimal-degree IGEOLO corner
georeference.  Graphic/text/DES/RES segments are carried as opaque
lengths (skipped on read, absent on write).  As with the lance and
icosa modules: no independent NITF producer exists in this offline
container, so cross-implementation byte parity is pinned only by the
field tables themselves + roundtrip tests.
"""
from __future__ import annotations

import numpy as np

__all__ = ["nitf_encode", "nitf_decode"]

# MIL-STD-2500C file header (NITF 2.1): (name, width).  FBKGC is the
# single binary field; everything else is space-padded ASCII (BCS-A).
_FILE_HEADER = [
    ("FHDR", 4), ("FVER", 5), ("CLEVEL", 2), ("STYPE", 4),
    ("OSTAID", 10), ("FDT", 14), ("FTITLE", 80),
    ("FSCLAS", 1), ("FSCLSY", 2), ("FSCODE", 11), ("FSCTLH", 2),
    ("FSREL", 20), ("FSDCTP", 2), ("FSDCDT", 8), ("FSDCXM", 4),
    ("FSDG", 1), ("FSDGDT", 8), ("FSCLTX", 43), ("FSCATP", 1),
    ("FSCAUT", 40), ("FSCRSN", 1), ("FSSRDT", 8), ("FSCTLN", 15),
    ("FSCOP", 5), ("FSCPYS", 5), ("ENCRYP", 1), ("FBKGC", 3),
    ("ONAME", 24), ("OPHONE", 18), ("FL", 12), ("HL", 6),
]

# image subheader through the security block (then the variable tail
# is handled field-by-field)
_IMAGE_HEADER = [
    ("IM", 2), ("IID1", 10), ("IDATIM", 14), ("TGTID", 17),
    ("IID2", 80),
    ("ISCLAS", 1), ("ISCLSY", 2), ("ISCODE", 11), ("ISCTLH", 2),
    ("ISREL", 20), ("ISDCTP", 2), ("ISDCDT", 8), ("ISDCXM", 4),
    ("ISDG", 1), ("ISDGDT", 8), ("ISCLTX", 43), ("ISCATP", 1),
    ("ISCAUT", 40), ("ISCRSN", 1), ("ISSRDT", 8), ("ISCTLN", 15),
    ("ENCRYP", 1), ("ISORCE", 42),
    ("NROWS", 8), ("NCOLS", 8), ("PVTYPE", 3), ("IREP", 8),
    ("ICAT", 8), ("ABPP", 2), ("PJUST", 1), ("ICORDS", 1),
]


def _pad(val: str, width: int) -> bytes:
    b = val.encode("ascii")
    if len(b) > width:
        raise ValueError(f"field overflow: {val!r} > {width}")
    return b.ljust(width)


def _num(val: int, width: int) -> bytes:
    return str(int(val)).zfill(width).encode("ascii")


def _igeolo_d(gt, h, w) -> str:
    """ICORDS='D' corners: ±dd.ddd±ddd.ddd per corner, order
    (0,0) (0,maxcol) (maxrow,maxcol) (maxrow,0)."""
    def corner(px, py):
        x = gt[0] + px * gt[1] + py * gt[2]
        y = gt[3] + px * gt[4] + py * gt[5]
        return f"{y:+07.3f}{x:+08.3f}"
    return (corner(0, 0) + corner(w, 0) + corner(w, h) + corner(0, h))


def nitf_encode(arr: np.ndarray, *, geotransform=None,
                title: str = "", idatim: str = "20260101000000",
                ostaid: str = "GEORAY", blocksize: int | None = None)\
        -> bytes:
    """(h, w[, bands]) uint8/uint16 → NITF 2.1 bytes (one image
    segment, IC=NC, IMODE P for multiband / B for one band, 16-bit
    samples big-endian per the spec).  ``blocksize`` tiles the image
    into an NBPR×NBPC row-major block grid with zero-padded partial
    blocks (MIL-STD-2500C blocking; the reference reads these via
    nitfimage.c NITFReadImageBlock)."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, nb = a.shape
    if a.dtype == np.uint8:
        nbpp, abpp = 8, 8
        sample = np.ascontiguousarray(a)
    elif a.dtype == np.uint16:
        nbpp, abpp = 16, 16
        sample = np.ascontiguousarray(a.astype(">u2"))
    else:
        raise ValueError(f"NITF minimal profile: uint8/uint16 only, "
                         f"got {a.dtype}")
    if blocksize is None:
        nbpr = nbpc = 1
        nppbh, nppbv = w, h
        payload = (sample if nb > 1 else sample[:, :, 0]).tobytes()
    else:
        bs = int(blocksize)
        if bs <= 0 or bs > 9999:
            raise ValueError("blocksize must be in 1..9999")
        nbpr = -(-w // bs)                 # blocks per row (ceil)
        nbpc = -(-h // bs)
        nppbh = nppbv = bs
        padded = np.zeros((nbpc * bs, nbpr * bs, nb), sample.dtype)
        padded[:h, :w, :] = sample
        blocks = padded.reshape(nbpc, bs, nbpr, bs, nb).swapaxes(1, 2)
        if nb == 1:
            blocks = blocks[..., 0]
        payload = np.ascontiguousarray(blocks).tobytes()
    imode = "P" if nb > 1 else "B"
    icords = "D" if geotransform is not None else " "

    sub = bytearray()
    vals = {
        "IM": "IM", "IID1": "IMG001", "IDATIM": idatim, "TGTID": "",
        "IID2": title, "ISCLAS": "U", "ISCLSY": "", "ISCODE": "",
        "ISCTLH": "", "ISREL": "", "ISDCTP": "", "ISDCDT": "",
        "ISDCXM": "", "ISDG": "", "ISDGDT": "", "ISCLTX": "",
        "ISCATP": "", "ISCAUT": "", "ISCRSN": "", "ISSRDT": "",
        "ISCTLN": "", "ENCRYP": "0", "ISORCE": "georay",
        "NROWS": str(h).zfill(8), "NCOLS": str(w).zfill(8),
        "PVTYPE": "INT", "IREP": "MULTI" if nb > 1 else "MONO",
        "ICAT": "VIS", "ABPP": str(abpp).zfill(2), "PJUST": "R",
        "ICORDS": icords,
    }
    for name, width in _IMAGE_HEADER:
        sub += _pad(vals[name], width)
    if icords != " ":
        sub += _pad(_igeolo_d(geotransform, h, w), 60)
    sub += b"0"                                   # NICOM
    sub += _pad("NC", 2)                          # IC (no COMRAT)
    sub += _num(nb, 1)                            # NBANDS
    for _ in range(nb):
        sub += _pad("M", 2)                       # IREPBAND
        sub += _pad("", 6)                        # ISUBCAT
        sub += _pad("N", 1)                       # IFC
        sub += _pad("", 3)                        # IMFLT
        sub += b"0"                               # NLUTS
    sub += b"0"                                   # ISYNC
    sub += _pad(imode, 1)                         # IMODE
    sub += _num(nbpr, 4) + _num(nbpc, 4)          # NBPR, NBPC
    sub += _num(nppbh, 4) + _num(nppbv, 4)        # NPPBH, NPPBV
    sub += _num(nbpp, 2)                          # NBPP
    sub += _num(1, 3)                             # IDLVL
    sub += _num(0, 3)                             # IALVL
    sub += _pad("0000000000", 10)                 # ILOC
    sub += _pad("1.0 ", 4)                        # IMAG
    sub += _num(0, 5) + _num(0, 5)                # UDIDL, IXSHDL

    fvals = {
        "FHDR": "NITF", "FVER": "02.10", "CLEVEL": "03",
        "STYPE": "BF01", "OSTAID": ostaid, "FDT": idatim,
        "FTITLE": title, "FSCLAS": "U", "FSCLSY": "", "FSCODE": "",
        "FSCTLH": "", "FSREL": "", "FSDCTP": "", "FSDCDT": "",
        "FSDCXM": "", "FSDG": "", "FSDGDT": "", "FSCLTX": "",
        "FSCATP": "", "FSCAUT": "", "FSCRSN": "", "FSSRDT": "",
        "FSCTLN": "", "FSCOP": "00000", "FSCPYS": "00000",
        "ENCRYP": "0", "ONAME": "", "OPHONE": "",
    }
    head = bytearray()
    for name, width in _FILE_HEADER:
        if name == "FBKGC":
            head += b"\x00\x00\x00"
        elif name == "FL":
            head += b"?" * 12                     # patched below
        elif name == "HL":
            head += b"?" * 6
        else:
            head += _pad(fvals[name], width)
    # segment tables: 1 image, 0 of everything else
    head += _num(1, 3) + _num(len(sub), 6) + _num(len(payload), 10)
    head += _num(0, 3)                            # NUMS
    head += _num(0, 3)                            # NUMX (reserved)
    head += _num(0, 3)                            # NUMT
    head += _num(0, 3)                            # NUMDES
    head += _num(0, 3)                            # NUMRES
    head += _num(0, 5) + _num(0, 5)               # UDHDL, XHDL
    hl = len(head)
    fl = hl + len(sub) + len(payload)
    out = bytes(head) + bytes(sub) + payload
    # patch FL/HL in place
    off = sum(wd for _, wd in _FILE_HEADER[:-2])  # start of FL
    return out[:off] + _num(fl, 12) + _num(hl, 6) + out[off + 18:]


def _take(data: bytes, pos: int, width: int) -> tuple[str, int]:
    return data[pos:pos + width].decode("ascii", "replace"), pos + width


def nitf_decode(data: bytes):
    """NITF 2.1 bytes → (array, meta).  meta: title, idatim, icords,
    corners (4 (lon, lat) tuples when ICORDS='D'), nbands."""
    pos = 0
    f = {}
    for name, width in _FILE_HEADER:
        f[name], pos = _take(data, pos, width)
    if f["FHDR"] != "NITF" or f["FVER"].strip() != "02.10":
        raise ValueError("not a NITF 2.1 file")
    numi = int(data[pos:pos + 3]); pos += 3
    segs = []
    for _ in range(numi):
        lish = int(data[pos:pos + 6]); pos += 6
        li = int(data[pos:pos + 10]); pos += 10
        segs.append((lish, li))
    nums = int(data[pos:pos + 3]); pos += 3
    pos += nums * (4 + 6)
    pos += 3                                       # NUMX (000)
    numt = int(data[pos:pos + 3]); pos += 3
    pos += numt * (4 + 5)
    numdes = int(data[pos:pos + 3]); pos += 3
    pos += numdes * (4 + 9)
    numres = int(data[pos:pos + 3]); pos += 3
    pos += numres * (4 + 7)
    udhdl = int(data[pos:pos + 5]); pos += 5
    pos += udhdl
    xhdl = int(data[pos:pos + 5]); pos += 5
    pos += xhdl
    hl = int(f["HL"])
    if pos != hl:
        raise ValueError(f"header length mismatch: {pos} != {hl}")
    if not segs:
        raise ValueError("no image segments")

    # first image segment
    s = {}
    for name, width in _IMAGE_HEADER:
        s[name], pos = _take(data, pos, width)
    corners = None
    if s["ICORDS"] != " ":
        geo, pos = _take(data, pos, 60)
        if s["ICORDS"] == "D":
            corners = [(float(geo[i + 7:i + 15]), float(geo[i:i + 7]))
                       for i in (0, 15, 30, 45)]
    nicom = int(data[pos:pos + 1]); pos += 1
    pos += nicom * 80
    ic, pos = _take(data, pos, 2)
    if ic not in ("NC", "NM"):
        raise ValueError(f"unsupported compression IC={ic!r} "
                         "(native codecs needed)")
    nbands = int(data[pos:pos + 1]); pos += 1
    for _ in range(nbands):
        pos += 2 + 6 + 1 + 3                      # IREPBAND..IMFLT
        nluts = int(data[pos:pos + 1]); pos += 1
        if nluts:
            raise ValueError("band LUTs unsupported")
    pos += 1                                       # ISYNC
    imode, pos = _take(data, pos, 1)
    nbpr = int(data[pos:pos + 4]); pos += 4
    nbpc = int(data[pos:pos + 4]); pos += 4
    nppbh = int(data[pos:pos + 4]); pos += 4
    nppbv = int(data[pos:pos + 4]); pos += 4
    nbpp = int(data[pos:pos + 2]); pos += 2
    pos += 3 + 3 + 10 + 4                          # IDLVL..IMAG
    udidl = int(data[pos:pos + 5]); pos += 5
    pos += udidl
    ixshdl = int(data[pos:pos + 5]); pos += 5
    pos += ixshdl
    h, w = int(s["NROWS"]), int(s["NCOLS"])
    dt = {8: np.dtype(np.uint8), 16: np.dtype(">u2")}[nbpp]
    if (nbpr, nbpc) != (1, 1):
        # row-major block grid, partial blocks zero-padded to
        # NPPBH×NPPBV (nitfimage.c NITFReadImageBlock layout)
        if nbands > 1 and imode != "P":
            raise ValueError("multi-block NITF: only IMODE P "
                             "multiband is supported")
        n = nbpr * nbpc * nppbh * nppbv * nbands
        raw = np.frombuffer(data, dt, count=n, offset=pos)
        blocks = raw.reshape(nbpc, nbpr, nppbv, nppbh, nbands)
        full = blocks.swapaxes(1, 2).reshape(
            nbpc * nppbv, nbpr * nppbh, nbands)
        arr = full[:h, :w, 0] if nbands == 1 else full[:h, :w, :]
    else:
        n = h * w * nbands
        raw = np.frombuffer(data, dt, count=n, offset=pos)
        if nbands == 1:
            arr = raw.reshape(h, w)
        elif imode == "P":
            arr = raw.reshape(h, w, nbands)
        elif imode == "B":
            arr = np.moveaxis(raw.reshape(nbands, h, w), 0, 2)
        else:
            raise ValueError(f"IMODE {imode!r} unsupported")
    if nbpp == 16:
        arr = arr.astype(np.uint16)
    meta = {"title": s["IID2"].strip(), "idatim": s["IDATIM"],
            "icords": s["ICORDS"], "corners": corners,
            "nbands": nbands}
    return np.ascontiguousarray(arr), meta
