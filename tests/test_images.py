"""Codec invariants + vectorized validation UDFs over Spark."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions.images import (
    PSNR_THRESHOLD_DB,
    decodable_udf,
    decode_image,
    encode_image,
    hamming64,
    phash64,
    phash_udf,
    psnr,
    psnr_vs_reference_udf,
    render_pixels,
)


def test_codec_roundtrip_psnr():
    px = render_pixels("img_x", 64, 48)
    assert decode_image(encode_image(px, "png")).tobytes() == px.tobytes()
    for fmt in ("jpeg", "webp"):
        got = decode_image(encode_image(px, fmt))
        assert psnr(got, px) >= PSNR_THRESHOLD_DB


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_image(b"not an image")


def test_render_is_deterministic_and_distinct():
    a = render_pixels("img_1", 32, 32)
    b = render_pixels("img_1", 32, 32)
    c = render_pixels("img_2", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_neardup_variant_phash_close():
    base = render_pixels("img_9", 64, 64)
    dup = render_pixels("img_9~d3", 64, 64)
    other = render_pixels("img_10", 64, 64)
    assert hamming64(phash64(base), phash64(dup)) <= 4
    assert hamming64(phash64(base), phash64(other)) > 10


def test_validation_udfs(spark):
    rows = []
    for iid, fmt in [("img_a", "png"), ("img_b", "jpeg"), ("img_c", "webp")]:
        px = render_pixels(iid, 32, 32)
        rows.append((iid, bytearray(encode_image(px, fmt))))
    rows.append(("img_corrupt", bytearray(b"garbage")))
    rows.append(("img_null", None))
    df = spark.createDataFrame(rows, ["image_id", "bytes"])
    out = df.select(
        "image_id",
        psnr_vs_reference_udf("image_id", "bytes").alias("psnr_db"),
        phash_udf("bytes").alias("ph"),
        decodable_udf("bytes").alias("ok"),
    ).collect()
    by_id = {r.image_id: r for r in out}
    for iid in ("img_a", "img_b", "img_c"):
        assert by_id[iid].psnr_db >= PSNR_THRESHOLD_DB
        assert by_id[iid].ok
        # UDF phash equals driver-side phash
        px = render_pixels(iid, 32, 32)
        assert by_id[iid].ph == phash64(decode_image(bytes(by_id_blob(df, iid))))
    corrupt_psnr = by_id["img_corrupt"].psnr_db
    assert corrupt_psnr is None or np.isnan(corrupt_psnr)
    assert not by_id["img_corrupt"].ok
    assert not by_id["img_null"].ok


def by_id_blob(df, iid):
    return bytes(df.filter(F.col("image_id") == iid).first().bytes)


def test_fixture_neardup_variants_have_present_base(tmp_path):
    """Every generated near-dup id 'img_X~dN' must have its base 'img_X'
    present in the corpus — a variant keyed on an index that was itself a
    variant would render pixels phash-close to nothing, silently
    undershooting the configured neardup_rate."""
    import pandas as pd

    from web_crawler_spark.sources.fixtures import generate_site

    d = str(tmp_path / "site")
    generate_site(d, n_pages=300, n_hosts=10, neardup_rate=0.5)
    ids = set(pd.read_parquet(f"{d}/urls.parquet")["image_id"])
    variants = [i for i in ids if "~d" in i]
    assert variants, "high neardup_rate must produce variants"
    for v in variants:
        base = v.partition("~d")[0]
        assert base in ids, f"{v} renders {base}, which is not in the corpus"
