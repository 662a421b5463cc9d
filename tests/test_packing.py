"""Sequence-packing tests: next-fit semantics, oversized isolation,
partitioning invariance, and the bin-stats audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.operators.packing import bin_stats, pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_next_fit_layout_single_bucket(spark):
    # budget 10, ids walked in order: 4+4 fit, 5 opens bin 1, 3+2 join it,
    # 9 opens bin 2
    rows = [(1, 4), (2, 4), (3, 5), (4, 3), (5, 2), (6, 9)]
    out = {
        r.doc_id: r
        for r in pack_sequences(
            _df(spark, rows), budget=10, n_buckets=1, bucket_expr=F.lit(0)
        ).collect()
    }
    assert [(out[i].bin_seq, out[i].pos_in_bin) for i in range(1, 7)] == [
        (0, 0), (0, 1), (1, 0), (1, 1), (1, 2), (2, 0),
    ]
    assert not any(out[i].oversized for i in range(1, 7))


def test_oversized_doc_sits_alone(spark):
    rows = [(1, 3), (2, 50), (3, 3), (4, 3)]
    out = {
        r.doc_id: r
        for r in pack_sequences(
            _df(spark, rows), budget=10, n_buckets=1, bucket_expr=F.lit(0)
        ).collect()
    }
    assert out[2].oversized and out[2].pos_in_bin == 0
    # nothing shares the oversized bin; the walk continues after it
    assert out[1].bin_seq == 0
    assert out[2].bin_seq == 1
    assert out[3].bin_seq == 2 and out[4].bin_seq == 2


def test_oversized_first_doc(spark):
    rows = [(1, 50), (2, 3)]
    out = {
        r.doc_id: r
        for r in pack_sequences(
            _df(spark, rows), budget=10, n_buckets=1, bucket_expr=F.lit(0)
        ).collect()
    }
    assert out[1] and (out[1].bin_seq, out[1].oversized) == (0, True)
    assert out[2].bin_seq == 1 and out[2].pos_in_bin == 0


def test_exact_fit_boundary(spark):
    # fill + t == budget joins the bin (strict > opens a new one)
    rows = [(1, 6), (2, 4), (3, 1)]
    out = {
        r.doc_id: r
        for r in pack_sequences(
            _df(spark, rows), budget=10, n_buckets=1, bucket_expr=F.lit(0)
        ).collect()
    }
    assert out[1].bin_seq == 0 and out[2].bin_seq == 0
    assert out[3].bin_seq == 1


def test_partitioning_invariance(spark):
    rows = [(i, (i * 7) % 23 + 1) for i in range(200)]
    base = pack_sequences(_df(spark, rows), budget=40, n_buckets=8)
    shuffled = pack_sequences(
        _df(spark, rows).repartition(13, "n_tokens"), budget=40, n_buckets=8
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shuffled.collect()))


def test_bin_stats_waste(spark):
    rows = [(1, 4), (2, 4), (3, 50)]
    packed = pack_sequences(
        _df(spark, rows), budget=10, n_buckets=1, bucket_expr=F.lit(0)
    )
    stats = {r.bin_seq: r for r in bin_stats(packed, budget=10).collect()}
    assert stats[0].n_docs == 2 and stats[0].fill == 8 and stats[0].waste == 2
    # oversized bin reports zero waste, not negative
    assert stats[1].fill == 50 and stats[1].waste == 0


def test_rejects_bad_params(spark):
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(_df(spark, [(1, 1)]), budget=0, n_buckets=1)
    with pytest.raises(ValueError):
        pack_sequences(_df(spark, [(1, 1)]), budget=10, n_buckets=0)
