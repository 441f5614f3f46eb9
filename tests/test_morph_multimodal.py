"""Sieve / proximity / fill-nodata kernels + multimodal stub plumbing."""

import numpy as np
import pytest

from georay import morph as M
from georay import multimodal as MM


def test_sieve_filter():
    band = np.zeros((12, 12), dtype=np.uint8)
    band[2:8, 2:8] = 5       # big region (36 px)
    band[4, 4] = 9           # 1-px speck inside it
    band[10, 10] = 7         # 1-px speck in background
    out = M.sieve_filter(band, threshold=4)
    assert out[4, 4] == 5    # speck merged into surrounding region
    assert out[10, 10] == 0  # speck merged into background
    assert (out[2:8, 2:8] == 5).all()
    # threshold larger than the mid region removes it too
    out2 = M.sieve_filter(band, threshold=40)
    assert (out2 == 0).all()


def test_proximity_exact_euclidean():
    mask = np.zeros((16, 16), dtype=bool)
    mask[4, 4] = True
    mask[12, 10] = True
    d = M.proximity(mask)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    expect = np.minimum(np.hypot(yy - 4, xx - 4), np.hypot(yy - 12, xx - 10))
    assert np.allclose(d, expect)
    # max_dist clip + cellsize scale
    d2 = M.proximity(mask, cellsize=2.0, max_dist=5.0)
    assert d2.max() == 5.0
    assert d2[4, 6] == pytest.approx(4.0)


def test_fill_nodata():
    band = np.full((10, 10), 100.0)
    band[3:6, 3:6] = 0
    mask = np.zeros((10, 10), dtype=bool)
    mask[3:6, 3:6] = True
    out = M.fill_nodata(band, mask)
    assert np.allclose(out[mask], 100.0, atol=1e-9)  # flat field fills flat
    assert np.array_equal(out[~mask], band[~mask])
    # gradient field fills between the sides
    grad = np.tile(np.arange(10, dtype=np.float64), (10, 1)) * 10
    g2 = grad.copy(); g2[4, 4] = -1
    m2 = np.zeros((10, 10), bool); m2[4, 4] = True
    filled = M.fill_nodata(g2, m2)
    assert 20 < filled[4, 4] < 60


def test_audio_features_stage(ray_session):
    import ray
    t = MM.audio_table(12)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(MM.AudioFeatures, batch_format="pyarrow",
                         concurrency=2).to_pandas()
    assert len(out) == 12
    dec = out[out["decoded"]]
    stub = out[~out["decoded"]]
    assert len(dec) == 6 and len(stub) == 6  # pcm16 decoded, opus stubbed
    assert (dec["rms"] > 0).all()
    # dominant frequency lands near the synthesized fundamental (110*(1+i%13))
    row0 = out[out["audio_id"] == "aud000000"].iloc[0]
    assert abs(row0["dominant_hz"] - 110.0) < 32


def test_audio_stub_raises_direct():
    feat = MM.AudioFeatures()
    with pytest.raises(NotImplementedError):
        feat._decode(b"\x00" * 16, "opus")


def test_video_frame_sampler(ray_session):
    import ray
    t = MM.video_table(6, frames=8)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(MM.VideoFrameSampler, batch_format="pyarrow",
                         concurrency=2,
                         fn_constructor_kwargs=dict(every_k=4)).to_pandas()
    # 3 rawrgb videos × frames {0, 4}
    assert len(out) == 6
    assert sorted(out["frame"].unique().tolist()) == [0, 4]
    assert (out["frame_checksum"] >= 0).all()


def test_pcm_roundtrip():
    sig = np.sin(np.linspace(0, 10, 1000))
    dec, rate = MM.fake_pcm_decode(MM.fake_pcm_encode(sig, 8000))
    assert rate == 8000
    assert np.allclose(dec, sig, atol=1e-4)


def test_proximity_tiles_matches_unsplit():
    """Cross-tile proximity (border-seed relax with nearest-site coords)
    equals the unsplit exact EDT — including tiles with NO local targets
    that depend entirely on multi-hop propagation."""
    import numpy as np
    from georay.morph import proximity, proximity_tiles
    from georay.polygonize import split_image_tiles
    # all targets concentrated in the top-left tile of a 3x3 grid
    mask = np.zeros((96, 96), dtype=bool)
    mask[5, 7] = mask[20, 12] = True
    ref = proximity(mask)
    tiles = {(ox, oy): t for ox, oy, t in split_image_tiles(mask, 32)}
    got = proximity_tiles(tiles)
    for (ox, oy), d in got.items():
        assert np.allclose(d, ref[oy:oy + 32, ox:ox + 32]), (ox, oy)
    # random scatter
    rng = np.random.default_rng(5)
    mask = rng.random((64, 48)) < 0.02
    ref = proximity(mask)
    tiles = {(ox, oy): t for ox, oy, t in split_image_tiles(mask, 16)}
    got = proximity_tiles(tiles)
    for (ox, oy), d in got.items():
        h, w = d.shape
        assert np.allclose(d, ref[oy:oy + h, ox:ox + w]), (ox, oy)


def test_sieve_tiles_matches_unsplit():
    import numpy as np
    from georay.morph import sieve_filter, sieve_tiles
    from georay.polygonize import split_image_tiles
    rng = np.random.default_rng(7)
    band = (rng.random((40, 56)) * 3).astype(np.uint8)
    ref = sieve_filter(band, 15)
    tiles = {(ox, oy): t for ox, oy, t in split_image_tiles(band, 20)}
    got = sieve_tiles(tiles, 15)
    for (ox, oy), t in got.items():
        h, w = t.shape
        assert np.array_equal(t, ref[oy:oy + h, ox:ox + w])
