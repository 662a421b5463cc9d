"""Multimodal plumbing tests: metadata, decode/feature extraction with
error-as-data rows, resize, frame packing and sampling."""

from __future__ import annotations

import numpy as np

from web_crawler_spark.functions import images as I
from web_crawler_spark.operators import multimodal as M


def _media(spark):
    px = I.render_pixels("img-a", 16, 12)
    good = I.encode_image(px, "png")
    lossy = I.encode_image(px, "jpeg")
    return spark.createDataFrame(
        [
            ("a", good),
            ("b", lossy),
            ("c", None),
            ("d", b"\x89PNG\r\n\x1a\nnotreally"),
            ("e", b"junkjunkjunk"),
        ],
        ["media_id", "bytes"],
    ), px


def test_media_meta(spark):
    df, _ = _media(spark)
    rows = {r["media_id"]: r for r in M.media_meta(df).collect()}
    assert rows["a"]["sniffed_fmt"] == "wcsi"
    assert rows["d"]["sniffed_fmt"] == "png"
    assert rows["e"]["sniffed_fmt"] == "unknown"
    assert rows["c"]["n_bytes"] == 0
    assert len(rows["a"]["sha256"]) == 64


def test_extract_features_error_as_data(spark):
    df, px = _media(spark)
    rows = {r["media_id"]: r for r in M.extract_features(df).collect()}
    assert rows["a"]["decoded"] and rows["a"]["w"] == 16 and rows["a"]["h"] == 12
    means = px.astype(np.float64).mean(axis=(0, 1))
    assert abs(rows["a"]["mean_r"] - means[0]) < 1e-9
    assert rows["a"]["phash"] == I.phash64(px)
    # lossy decode works and stays perceptually close
    assert rows["b"]["decoded"]
    assert I.hamming64(rows["b"]["phash"], rows["a"]["phash"]) <= 4
    # real-codec stub and garbage become decoded=false rows, never exceptions
    for mid in ("c", "d", "e"):
        assert rows[mid]["decoded"] is False and rows[mid]["w"] is None


def test_resize_images(spark):
    df, _ = _media(spark)
    rows = {r["media_id"]: r["bytes"] for r in M.resize_images(df, out_w=8, out_h=6).collect()}
    out = I.decode_image(bytes(rows["a"]))
    assert out.shape == (6, 8, 3)
    assert rows["c"] is None and rows["e"] is None


def test_frame_pack_roundtrip_and_sampling(spark):
    frames = [I.encode_image(I.render_pixels(f"f{i}", 8, 8), "png") for i in range(7)]
    blob = M.pack_frames(frames)
    assert M.unpack_frames(blob) == frames
    df = spark.createDataFrame([("v", blob)], ["media_id", "bytes"])
    rows = M.sample_frames(df, every=3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    assert bytes(rows[1]["frame_bytes"]) == frames[3]
