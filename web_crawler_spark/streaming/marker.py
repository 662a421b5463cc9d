"""Exactly-once marker identity for foreachBatch sinks.

Structured Streaming batch ids are only meaningful relative to ONE stream
checkpoint: a recreated checkpoint (ops wipe, or a second stream feeding
the same table) renumbers batches from 0. A marker keyed on the bare
batch_id would then silently skip never-applied data — batch 3 of the new
stream is not batch 3 of the old one. Scoping the marker by the stream's
query id (which Spark regenerates whenever the checkpoint directory is
recreated) keeps idempotence exactly where it is sound: replays WITHIN one
checkpoint's lifetime.

Re-feeding the same source through a fresh checkpoint therefore re-applies
it — the correct default for this engine, where the crawl round's seen-set
anti-join and first-wins dedupe make duplicated frontier rows harmless,
and the alternative (silently dropping new data) is never recoverable.
"""

from __future__ import annotations

import json
import os


def stream_app_id(checkpoint_dir: str) -> str:
    """Identity of the stream incarnation writing through this checkpoint:
    Structured Streaming's query id, read from the checkpoint's ``metadata``
    file (written at stream start, so it exists by the time any foreachBatch
    body runs). Falls back to the checkpoint path if the file is missing or
    unreadable (pre-start probing, hand-rolled checkpoints)."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            qid = json.load(f)["id"]
        return str(qid)
    except (FileNotFoundError, KeyError, ValueError):
        return os.path.abspath(checkpoint_dir)


def marker_value(checkpoint_dir: str, batch_id: int) -> str:
    """The value recorded in (and checked against) SnapshotTable commit
    metadata for one applied micro-batch."""
    return f"{stream_app_id(checkpoint_dir)}:{int(batch_id)}"
