"""K6 zip archives (reference backend/api/routes.py:442-517)."""

from __future__ import annotations

import hashlib
import io
import zipfile

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators.archive import (
    build_zip_bytes,
    zip_archives,
    zip_oracle_rows,
)

ROWS = [
    {"job_id": 0, "folder": "page_0", "file_name": "b.md", "content": b"hello world"},
    {"job_id": 0, "folder": "page_0", "file_name": "a.md", "content": b"alpha"},
    {"job_id": 0, "folder": "page_3", "file_name": "c.md", "content": b"gamma"},
    {"job_id": 1, "folder": "page_1", "file_name": "d.md", "content": b"delta"},
    {"job_id": 1, "folder": "page_1", "file_name": "e.md", "content": b""},
]


def test_build_zip_roundtrip_and_determinism():
    blob = build_zip_bytes([("b.md", b"hello world"), ("a.md", b"alpha")])
    zf = zipfile.ZipFile(io.BytesIO(blob))
    # members name-sorted at the zip root (routes.py:471-475 files-at-root
    # contract with this engine's pinned deterministic order)
    assert zf.namelist() == ["a.md", "b.md"]
    assert zf.read("b.md") == b"hello world"
    assert all(i.date_time == (1980, 1, 1, 0, 0, 0) for i in zf.infolist())
    # byte-identical regardless of input order
    assert blob == build_zip_bytes([("a.md", b"alpha"), ("b.md", b"hello world")])


def test_folder_level_matches_oracle(spark):
    df = spark.createDataFrame(
        ROWS, "job_id long, folder string, file_name string, content binary"
    )
    got = {
        (r["job_id"], r["folder"]): r
        for r in zip_archives(df, level="folder").collect()
    }
    exp = {
        (r["job_id"], r["folder"]): r
        for r in zip_oracle_rows(ROWS)
        if r["level"] == "folder"
    }
    assert got.keys() == exp.keys()
    for k, e in exp.items():
        g = got[k]
        assert g["zip_name"] == e["zip_name"]
        assert g["n_files"] == e["n_files"]
        assert g["total_bytes"] == e["total_bytes"]
        assert g["zip_size"] == e["zip_size"]
        assert g["zip_sha256"] == e["zip_sha256"]


def test_job_level_matches_oracle(spark):
    df = spark.createDataFrame(
        ROWS, "job_id long, folder string, file_name string, content binary"
    )
    got = {r["job_id"]: r for r in zip_archives(df, level="job").collect()}
    exp = {
        r["job_id"]: r for r in zip_oracle_rows(ROWS) if r["level"] == "job"
    }
    assert got.keys() == exp.keys()
    for k, e in exp.items():
        g = got[k]
        # arcnames are folder/file (routes.py:505-511)
        assert g["folder"] is None
        assert g["zip_name"] == f"crawl_results_{k}.zip"
        assert g["zip_sha256"] == e["zip_sha256"]


def test_partitioning_invariance(spark):
    """Archive bytes are a pure function of the member set — identical
    results from 1 vs 8 input partitions (the 100 TB property: packing is
    shuffle-then-local, so cluster layout cannot change the output)."""
    df1 = spark.createDataFrame(
        ROWS, "job_id long, folder string, file_name string, content binary"
    ).coalesce(1)
    df8 = spark.createDataFrame(
        ROWS, "job_id long, folder string, file_name string, content binary"
    ).repartition(8)
    a = sorted(
        (r["level"], r["job_id"], r["folder"], r["zip_sha256"])
        for r in zip_archives(df1, level="folder")
        .unionByName(zip_archives(df1, level="job"))
        .collect()
    )
    b = sorted(
        (r["level"], r["job_id"], r["folder"], r["zip_sha256"])
        for r in zip_archives(df8, level="folder")
        .unionByName(zip_archives(df8, level="job"))
        .collect()
    )
    assert a == b


def test_level_validation(spark):
    df = spark.createDataFrame(
        ROWS, "job_id long, folder string, file_name string, content binary"
    )
    with pytest.raises(ValueError):
        zip_archives(df, level="nope")


def test_duplicate_arcnames_are_order_independent():
    """Two members with the same arcname (a file re-written on retry) must
    still produce byte-identical archives regardless of arrival order —
    name-only sorting is stable and would preserve partition-dependent
    order, making zip bytes depend on cluster layout."""
    a = build_zip_bytes([("x.md", b"v2"), ("x.md", b"v1"), ("a.md", b"z")])
    b = build_zip_bytes([("x.md", b"v1"), ("a.md", b"z"), ("x.md", b"v2")])
    assert a == b
