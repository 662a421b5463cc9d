"""SavedJobStore CRUD parity (reference backend/api/models.py:304-390):
create / update (immutable id+created_at) / rename / case-insensitive
find_by_name / most-recent-first listing / delete, over the log-structured
SnapshotTable with latest-wins resolution and tombstones."""

from __future__ import annotations

from web_crawler_spark.sources.jobstore import SavedJobStore


def _store(spark, tmp_path) -> SavedJobStore:
    return SavedJobStore(spark, str(tmp_path / "jobs"))


def test_create_get_roundtrip(spark, tmp_path):
    s = _store(spark, tmp_path)
    j = s.create(
        name="Nightly shop crawl",
        config={"mode": "content", "formats": ["txt", "md"], "download_images": True},
        description="shop catalog",
        now_ms=1000,
    )
    got = s.get(j["saved_job_id"])
    assert got is not None
    assert got["name"] == "Nightly shop crawl"
    assert got["config"]["formats"] == ["txt", "md"]
    assert got["created_at_ms"] == got["updated_at_ms"] == 1000
    assert s.get("nope") is None


def test_find_by_name_case_insensitive_trimmed(spark, tmp_path):
    """models.py:378-384: lower().strip() equality on both sides."""
    s = _store(spark, tmp_path)
    j = s.create(name="  My Crawl  ", config={}, now_ms=1)
    assert s.find_by_name("my crawl")["saved_job_id"] == j["saved_job_id"]
    assert s.find_by_name("MY CRAWL ")["saved_job_id"] == j["saved_job_id"]
    assert s.find_by_name("other") is None
    # shared names resolve most-recently-updated first
    j2 = s.create(name="My Crawl", config={"v": 2}, now_ms=5)
    assert s.find_by_name("my crawl")["saved_job_id"] == j2["saved_job_id"]


def test_update_merges_and_protects_immutables(spark, tmp_path):
    """models.py:351-363: fields merge, saved_job_id/created_at immutable,
    updated_at bumps; unknown ids return None."""
    s = _store(spark, tmp_path)
    j = s.create(name="a", config={"mode": "content"}, now_ms=10)
    got = s.update(
        j["saved_job_id"],
        {
            "description": "new desc",
            "config": {"mode": "links"},
            "saved_job_id": "hijack",
            "created_at_ms": 999,
        },
        now_ms=20,
    )
    assert got["saved_job_id"] == j["saved_job_id"]
    assert got["created_at_ms"] == 10  # immutable
    assert got["updated_at_ms"] == 20
    assert got["description"] == "new desc"
    assert got["config"] == {"mode": "links"}
    assert got["version"] == 2
    assert s.update("missing", {"name": "x"}) is None
    # the resolved view shows exactly the latest version
    cur = s.get(j["saved_job_id"])
    assert cur["config"] == {"mode": "links"} and cur["version"] == 2


def test_rename_delete_and_listing(spark, tmp_path):
    s = _store(spark, tmp_path)
    a = s.create(name="alpha", config={}, now_ms=1)
    b = s.create(name="beta", config={}, now_ms=2)
    s.rename(a["saved_job_id"], "alpha-2", now_ms=3)
    # listing: most-recent-updated first (models.py:370-376)
    names = [r["name"] for r in s.all_jobs().collect()]
    assert names == ["alpha-2", "beta"]
    assert s.find_by_name("alpha") is None
    assert s.find_by_name("ALPHA-2")["saved_job_id"] == a["saved_job_id"]
    # delete: tombstone, repeat-delete False (models.py:386-392)
    assert s.delete(b["saved_job_id"], now_ms=4) is True
    assert s.delete(b["saved_job_id"], now_ms=5) is False
    assert s.get(b["saved_job_id"]) is None
    assert [r["name"] for r in s.all_jobs().collect()] == ["alpha-2"]
    # an update on a deleted id is refused (no resurrection)
    assert s.update(b["saved_job_id"], {"name": "zombie"}) is None


def test_compact_preserves_live_state_and_drops_tombstones(spark, tmp_path):
    s = _store(spark, tmp_path)
    a = s.create(name="keep", config={"k": 1}, now_ms=1)
    b = s.create(name="drop", config={}, now_ms=2)
    s.update(a["saved_job_id"], {"config": {"k": 2}}, now_ms=3)
    s.delete(b["saved_job_id"], now_ms=4)
    before = sorted(map(tuple, s.all_jobs().collect()))
    s.compact()
    assert sorted(map(tuple, s.all_jobs().collect())) == before
    assert s.table.read(spark).count() == 1  # one live row left in the log
    assert s.get(a["saved_job_id"])["config"] == {"k": 2}
    # CRUD keeps working on the compacted log
    s.rename(a["saved_job_id"], "kept", now_ms=5)
    assert s.find_by_name("kept") is not None


def test_update_rejects_raw_config_json(spark, tmp_path):
    """A raw config_json (or any typo'd field) must fail BEFORE anything is
    committed — a non-JSON value in the log would poison every later
    get()/find_by_name() with a decode error, permanently."""
    import pytest

    from web_crawler_spark.sources.jobstore import SavedJobStore

    store = SavedJobStore(spark, str(tmp_path / "jobs"))
    j = store.create(name="crawl-a", config={"depth": 2}, now_ms=1)
    with pytest.raises(ValueError, match="config_json"):
        store.update(j["saved_job_id"], {"config_json": "oops"}, now_ms=2)
    with pytest.raises(ValueError, match="unknown"):
        store.update(j["saved_job_id"], {"nmae": "typo"}, now_ms=2)
    # nothing was committed; the store stays readable and at version 1
    got = store.get(j["saved_job_id"])
    assert got["version"] == 1 and got["config"] == {"depth": 2}


def test_concurrent_updates_allocate_distinct_versions(spark, tmp_path):
    """The store-level mutation lock serializes the read-modify-write:
    concurrent updates must land distinct versions (duplicate versions
    would make current()'s latest-wins resolution nondeterministic)."""
    import threading

    from web_crawler_spark.sources.jobstore import SavedJobStore

    store = SavedJobStore(spark, str(tmp_path / "jobs"))
    j = store.create(name="crawl-a", config={}, now_ms=1)
    jid = j["saved_job_id"]
    stores = [SavedJobStore(spark, str(tmp_path / "jobs")) for _ in range(4)]
    errs: list = []

    def worker(s, i):
        try:
            for k in range(3):
                s.update(jid, {"description": f"w{i}.{k}"}, now_ms=10 + i)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s, i)) for i, s in enumerate(stores)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    from pyspark.sql import functions as F

    log = store._log().filter(F.col("saved_job_id") == jid).collect()
    versions = sorted(r["version"] for r in log)
    assert versions == list(range(1, 14)), versions  # 1 create + 12 updates
