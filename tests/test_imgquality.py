"""Image quality metrics (georay.imgquality): closed-form fixtures pin
each metric; the actor stage's stacked grouping equals per-image math."""

import numpy as np
import pyarrow as pa
import pytest

from georay.imgquality import ImageQuality, quality_metrics


def test_closed_form_metrics():
    # constant mid-gray: zero contrast/sharpness/entropy≈0, brightness
    flat = np.full((1, 16, 16, 3), 128, np.uint8)
    m = quality_metrics(flat)
    assert m["contrast"][0] == 0.0
    assert m["sharpness"][0] == 0.0
    assert m["entropy"][0] == pytest.approx(0.0)
    assert abs(m["brightness"][0] - 128) <= 1      # integer luma
    assert m["dark_frac"][0] == 0.0
    assert m["bright_frac"][0] == 0.0

    # black image: dark_frac 1
    black = np.zeros((1, 8, 8, 3), np.uint8)
    m = quality_metrics(black)
    assert m["dark_frac"][0] == 1.0 and m["brightness"][0] == 0.0

    # checkerboard 0/255: max contrast and huge Laplacian variance
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    cb = (((yy + xx) % 2) * 255).astype(np.uint8)
    cbi = np.stack([cb] * 3, 2)[None]
    m = quality_metrics(cbi)
    assert m["contrast"][0] == pytest.approx(127.5, abs=1.0)
    assert m["sharpness"][0] > 100000
    assert m["entropy"][0] == pytest.approx(1.0, abs=0.01)  # 2 levels

    # linear gradient: ∇² of a linear surface is identically zero —
    # blur scoring can't distinguish a ramp from defocus (the known
    # property of Laplacian-variance); entropy still high
    g = np.tile(np.arange(256, dtype=np.uint8), (8, 1))
    gi = np.stack([g] * 3, 2)[None]
    m = quality_metrics(gi)
    assert m["sharpness"][0] == pytest.approx(0.0)
    assert m["entropy"][0] > 5                      # many distinct levels


def test_stage_mixed_shapes_and_flag():
    imgs = [np.full((8, 8, 3), 200, np.uint8),         # ok-ish but flat
            np.zeros((12, 10, 3), np.uint8),           # dark → low
            (np.random.RandomState(3)
             .randint(0, 255, (8, 8, 3)).astype(np.uint8))]  # noisy: ok
    batch = pa.table({
        "image_id": ["a", "b", "c"],
        "h": pa.array([i.shape[0] for i in imgs], pa.int32()),
        "w": pa.array([i.shape[1] for i in imgs], pa.int32()),
        "pixels": pa.array([i.tobytes() for i in imgs], pa.binary()),
    })
    out = ImageQuality()(batch).to_pandas()
    assert list(out.image_id) == ["a", "b", "c"]
    assert bool(out.low_quality[1])                    # black
    assert not bool(out.low_quality[2])                # noise is "sharp"
    # flat constant image trips the sharpness/entropy floor
    assert bool(out.low_quality[0])
    # stacked grouping == direct per-image metrics
    for i, img in enumerate(imgs):
        m = quality_metrics(img[None])
        assert out.brightness[i] == pytest.approx(m["brightness"][0])
        assert out.sharpness[i] == pytest.approx(m["sharpness"][0])
