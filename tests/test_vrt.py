"""Persisted pipeline plans (georay.vrt) — the VRT analog
(frmts/vrt/vrtdataset.cpp: XML-serialized logical plan, derived-band
pixel functions in files)."""

import pandas as pd
import pytest

from georay.vrt import RasterPlan


@pytest.fixture(scope="module")
def images_path(tmp_path_factory):
    from georay import fixtures as fx
    p = tmp_path_factory.mktemp("vrt_imgs")
    return fx.write_images_parquet(str(p / "images"), 60,
                                   rows_per_file=30)


def test_plan_xml_roundtrip_stable():
    plan = (RasterPlan.read_parquet("/tmp/x", columns=["image_id",
                                                       "bytes", "fmt"])
            .where("w >= 64 AND fmt = 'png'")
            .decode(with_checksum=True)
            .translate(srcwin=(1, 2, 30, 40), outsize=(16, 16),
                       resampling="bilinear")
            .calc("A * 2 + 1", out_col="twice")
            .dem(mode="slope")
            .cut_tiles(zoom=7, resampling="average"))
    xml = plan.to_xml()
    plan2 = RasterPlan.from_xml(xml)
    assert plan2.to_xml() == xml                 # fixed point
    assert plan2.source == plan.source
    assert plan2.steps[0] == ("where", {"clause": "w >= 64 AND "
                                        "fmt = 'png'"})
    # tuples survive as lists (JSON) — build() re-tuples them
    assert plan2.steps[2][1]["srcwin"] == [1, 2, 30, 40]
    # the derived-band expression rides in <PixelFunction>
    assert "<PixelFunction>A * 2 + 1</PixelFunction>" in xml


def test_plan_save_load_execute(ray_session, tmp_path, images_path):
    """A plan persisted to disk builds the identical pipeline: saved →
    loaded → executed equals the directly-built execution."""
    plan = (RasterPlan.read_parquet(images_path)
            .where("fmt = 'png'")
            .decode()
            .calc("A + 1", out_col="c1"))
    p = str(tmp_path / "plan.vrt.xml")
    plan.save(p)
    loaded = RasterPlan.load(p)
    a = (plan.build().dataset().to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (loaded.build().dataset().to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 and "c1" in a.columns


def test_plan_rejects_garbage():
    with pytest.raises(ValueError):
        RasterPlan.from_xml("<NotAPlan/>")
    with pytest.raises(ValueError):
        RasterPlan.from_xml(
            "<GeoRayPipeline><Source type='parquet'><Path>/x</Path>"
            "</Source><Step kind='rm_rf'/></GeoRayPipeline>")
    with pytest.raises(ValueError):
        RasterPlan({"type": "parquet", "path": "/x"})._add("nope")
