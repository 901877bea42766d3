"""Multimodal stage tests: real raw-codec math, stubbed compressed codecs,
and the Ray actor-pool plumbing end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.stages.multimodal import (
    AudioFeatures,
    ImageDecode,
    ImageResize,
    MEDIA_SCHEMA,
    VideoFrameSample,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media() -> pa.Table:
    t = synth_media_table(n=30, seed=123)
    assert t.schema.equals(MEDIA_SCHEMA)
    return t


def test_synth_deterministic(media):
    again = synth_media_table(n=30, seed=123)
    assert media.equals(again)


def test_image_decode_stats(media):
    imgs = media.filter(pa.compute.equal(media["kind"], "image"))
    out = ImageDecode()(imgs)
    assert out.num_rows == imgs.num_rows
    # verify one row against direct numpy
    px = np.frombuffer(imgs["payload"][0].as_py(), dtype=np.uint8)
    assert out["px_mean"][0].as_py() == pytest.approx(px.mean())
    assert out["px_std"][0].as_py() == pytest.approx(px.std())
    hist = np.asarray(out["hist"][0].as_py())
    assert hist.sum() == pytest.approx(1.0, abs=1e-6)


def test_image_resize_shapes(media):
    imgs = media.filter(pa.compute.equal(media["kind"], "image"))
    out = ImageResize(out_w=4, out_h=6)(imgs)
    for i in range(out.num_rows):
        assert len(out["payload"][i].as_py()) == 4 * 6 * out["channels"][i].as_py()
    # nearest-neighbor: corner pixel preserved
    src = np.frombuffer(imgs["payload"][0].as_py(), dtype=np.uint8).reshape(
        imgs["height"][0].as_py(), imgs["width"][0].as_py(), 3
    )
    dst = np.frombuffer(out["payload"][0].as_py(), dtype=np.uint8).reshape(6, 4, 3)
    assert (dst[0, 0] == src[0, 0]).all()


def test_audio_features(media):
    aud = media.filter(pa.compute.equal(media["kind"], "audio"))
    out = AudioFeatures(frame=128)(aud)
    x = np.frombuffer(aud["payload"][0].as_py(), dtype=np.int16).astype(np.float64) / 32768.0
    assert out["rms"][0].as_py() == pytest.approx(np.sqrt((x**2).mean()))
    assert out["duration_s"][0].as_py() == pytest.approx(len(x) / 16000)
    assert len(out["frame_rms"][0].as_py()) == len(x) // 128


def test_video_frame_sample(media):
    vid = media.filter(pa.compute.equal(media["kind"], "video"))
    out = VideoFrameSample(every=3)(vid)
    n_expected = sum(-(-f // 3) for f in vid["n_frames"].to_pylist())
    assert out.num_rows == n_expected
    raw = np.frombuffer(vid["payload"][0].as_py(), dtype=np.uint8)
    w, h, c = (vid[k][0].as_py() for k in ("width", "height", "channels"))
    first = np.frombuffer(out["payload"][0].as_py(), dtype=np.uint8)
    assert (first == raw[: w * h * c]).all()


def test_compressed_codec_is_stubbed(media):
    jpeg = pa.table(
        {
            name: (pa.array(["jpeg"], pa.string()) if name == "codec" else media[name].slice(0, 1))
            for name in media.column_names
        }
    )
    with pytest.raises(NotImplementedError, match="jpeg"):
        ImageDecode()(jpeg)


def test_media_actor_pool_pipeline(ray_session, media, tmp_path):
    """End-to-end through Ray: parquet → actor-pool decode → parquet."""
    import pyarrow.parquet as pq
    import ray.data as rd

    src = str(tmp_path / "media.parquet")
    pq.write_table(media, src)
    ds = rd.read_parquet(src)
    imgs = ds.filter(expr="kind == 'image'")
    out = imgs.map_batches(
        ImageDecode, batch_format="pyarrow", concurrency=2, batch_size=8
    )
    pdf = out.to_pandas()
    n_imgs = media.filter(pa.compute.equal(media["kind"], "image")).num_rows
    assert len(pdf) == n_imgs
    assert set(pdf.columns) == {"media_id", "px_mean", "px_std", "hist"}
