"""Sequence packing: assemble documents into fixed token-budget training
sequences (the batching step between curation and tokenization in every
LLM data pipeline — T5's "pack to 512", GPT-style context filling).

Beyond-reference, first-class (SURVEY §2 training-data family): the
reference crawler stops at per-document artifacts; a training pipeline
over its output needs documents grouped into context-window-sized bins
with minimal padding waste.

Semantics — deterministic greedy NEXT-FIT within hash buckets:

* every document is assigned to one of ``n_buckets`` buckets by a
  deterministic expression over its id (default ``pmod(xxhash64(id),
  n_buckets)``); bucketing decorrelates bin composition from ingest order
  and bounds the serial section,
* within a bucket, documents are walked in ascending id order and packed
  next-fit: a document joins the current bin iff its tokens fit in the
  remaining budget, else it opens a new bin. A document larger than the
  whole budget therefore always sits alone in its own bin (callers can
  split or drop those via the ``oversized`` flag),
* output is one row per document — (bucket, bin_seq, pos_in_bin) fully
  determines the packed layout and is bit-stable across partitionings,
  engines, and cluster sizes.

Scale shape at 100 TB: one shuffle (hash partition by bucket), then an
Arrow-batched ``applyInPandas`` per bucket. Packing is inherently
sequential *within* a bin sequence — that serial section is exactly one
bucket, so ``n_buckets`` is the parallelism/skew knob: size it so a
bucket's documents fit one task (e.g. 2^14 buckets over 10^10 docs ≈
6·10^5 docs/bucket). The per-bucket walk is O(n) with no lookback
(next-fit, not first-fit — first-fit's open-bin state would make results
depend on how many bins stay open, next-fit is single-pass and its SQL
twin is a linear recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_seq", T.LongType()),
        T.StructField("pos_in_bin", T.LongType()),
        T.StructField("oversized", T.BooleanType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    *,
    budget: int,
    n_buckets: int = 64,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Pack documents into token-budget bins (greedy next-fit per bucket).

    ``df`` needs an int64 ``id_col`` and a non-negative int ``tokens_col``
    (pre-computed — token counting stays a pure column expression upstream,
    e.g. ``functions.text.ws_token_count``). ``bucket_expr`` overrides the
    default ``pmod(xxhash64(id), n_buckets)`` assignment (the oracle query
    uses ``id % n_buckets`` so plain SQL can replay it).

    Returns (bucket, doc_id, n_tokens, bin_seq, pos_in_bin, oversized):
    ``bin_seq`` numbers bins 0.. within the bucket, ``pos_in_bin`` numbers
    documents 0.. within the bin, ``oversized`` marks documents whose
    tokens exceed the whole budget (they occupy a bin alone).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    budget = int(budget)
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_buckets)))

    assigned = df.select(
        bucket_expr.cast("long").alias("bucket"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        toks = pdf["n_tokens"].to_numpy()
        bin_seq = [0] * n
        pos_in_bin = [0] * n
        # inherently sequential walk — one bucket per task, O(n), no lookback
        cur_bin, cur_pos, fill = 0, 0, 0
        for i in range(n):
            t = int(toks[i])
            if i > 0 and fill + t > budget:
                cur_bin += 1
                cur_pos = 0
                fill = 0
            bin_seq[i] = cur_bin
            pos_in_bin[i] = cur_pos
            fill += t
            cur_pos += 1
        out = pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "bin_seq": pd.array(bin_seq, dtype="int64"),
                "pos_in_bin": pd.array(pos_in_bin, dtype="int64"),
            }
        )
        out["oversized"] = out["n_tokens"] > budget
        return out

    return assigned.groupBy("bucket").applyInPandas(_pack, _OUT_SCHEMA)


def bin_stats(packed: DataFrame, *, budget: int) -> DataFrame:
    """Per-bin fill statistics over :func:`pack_sequences` output — the
    padding-waste audit (one groupBy on the already-materialized layout):
    (bucket, bin_seq, n_docs, fill, waste). Oversized bins report
    ``waste = 0`` (nothing could share them)."""
    return packed.groupBy("bucket", "bin_seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("fill"),
        F.greatest(F.lit(0), F.lit(int(budget)) - F.sum("n_tokens"))
        .cast("long")
        .alias("waste"),
    )
