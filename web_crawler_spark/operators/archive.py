"""ZIP archive sink (K6 — reference backend/api/routes.py:442-517).

The reference offers two archive endpoints over a job's materialized
output files:

- per-folder (`routes.py:442-481`): every file of ONE result folder,
  written at the **root** of the zip (`zipf.write(file, file.name)`,
  routes.py:471-475), archive named ``{folder}.zip``;
- per-job (`routes.py:484-517`): every file of every result folder,
  arcname ``{folder}/{file}`` (routes.py:505-511), download name
  ``crawl_results_{job_id}.zip``.

Spark-first shape: the files table (K1's per-(url,fmt) outputs) is grouped
by archive key and each group is packed by ONE Arrow-batched
``applyInPandas`` task — a single shuffle on the archive key, then
embarrassingly parallel packing; no driver involvement and no temp files.
Determinism (so results are byte-stable across partitionings and between
the engine and its oracle twin): members are sorted by arcname and carry a
fixed DOS timestamp; the reference's ``iterdir()`` order is
filesystem-dependent, so the sorted order is this engine's pinned
refinement of the same contract.
"""

from __future__ import annotations

import hashlib
import io
import zipfile
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed DOS timestamp (the zip epoch) — archive bytes become a pure
# function of the member (arcname, content) list.
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)

_OUT_SCHEMA = (
    "level string, job_id long, folder string, zip_name string, "
    "n_files long, total_bytes long, zip_size long, zip_sha256 string"
)


def build_zip_bytes(members: Iterable[tuple[str, bytes]]) -> bytes:
    """Deterministic in-memory zip: name-sorted members, ZIP_DEFLATED
    (routes.py:470), fixed timestamp. Pure function — unit-testable and
    shared by engine and tests. Ties on arcname (the same file written
    twice, e.g. a K1 output re-materialized on retry) are broken by
    content, so the bytes stay a pure function of the member MULTISET —
    name-only sorting is stable and would preserve the partition-dependent
    arrival order of duplicates."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, data in sorted(members, key=lambda m: (m[0], m[1])):
            zi = zipfile.ZipInfo(arcname, date_time=_ZIP_EPOCH)
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def zip_archives(files: DataFrame, *, level: str = "folder") -> DataFrame:
    """Pack a files table into zip archives.

    ``files``: (job_id, folder, file_name, content: binary) — one row per
    materialized output file (K1).

    ``level='folder'`` → one row per (job_id, folder), members at zip root;
    ``level='job'``    → one row per job_id, members ``{folder}/{file}``.

    Returns (level, job_id, folder, zip_name, n_files, total_bytes,
    zip_size, zip_sha256); ``folder`` is NULL at job level. The archive
    bytes themselves are summarized as size+sha256 (the driver-contract
    result shape); callers that need the bytes use ``build_zip_bytes`` on
    a collected group or write via foreachPartition.
    """
    if level not in ("folder", "job"):
        raise ValueError(f"level must be 'folder' or 'job', got {level!r}")
    keys = ["job_id", "folder"] if level == "folder" else ["job_id"]

    def pack(pdf):
        import pandas as pd

        job_id = int(pdf["job_id"].iloc[0])
        if level == "folder":
            folder = pdf["folder"].iloc[0]
            members = list(zip(pdf["file_name"], pdf["content"]))
            zip_name = f"{folder}.zip"
        else:
            folder = None
            members = [
                (f"{f}/{n}", c)
                for f, n, c in zip(pdf["folder"], pdf["file_name"], pdf["content"])
            ]
            zip_name = f"crawl_results_{job_id}.zip"
        blob = build_zip_bytes(members)
        return pd.DataFrame(
            [
                {
                    "level": level,
                    "job_id": job_id,
                    "folder": folder,
                    "zip_name": zip_name,
                    "n_files": len(members),
                    "total_bytes": int(sum(len(c) for c in pdf["content"])),
                    "zip_size": len(blob),
                    "zip_sha256": hashlib.sha256(blob).hexdigest(),
                }
            ]
        )

    cols = ["job_id", "folder", "file_name", "content"]
    return files.select(*cols).groupBy(*keys).applyInPandas(pack, _OUT_SCHEMA)


def zip_oracle_rows(rows) -> list[dict]:
    """Pure-Python twin used for expected-output generation: same packing
    over an iterable of (job_id, folder, file_name, content) dicts, both
    levels, pandas/Spark-free. Lives here so the algorithm under test and
    its reference packing share only ``build_zip_bytes`` (the byte format),
    not the dataflow."""
    by_folder: dict[tuple[int, str], list[tuple[str, bytes]]] = {}
    by_job: dict[int, list[tuple[str, bytes]]] = {}
    totals_f: dict[tuple[int, str], int] = {}
    totals_j: dict[int, int] = {}
    for r in rows:
        j, f, n, c = int(r["job_id"]), r["folder"], r["file_name"], r["content"]
        by_folder.setdefault((j, f), []).append((n, c))
        totals_f[(j, f)] = totals_f.get((j, f), 0) + len(c)
        by_job.setdefault(j, []).append((f"{f}/{n}", c))
        totals_j[j] = totals_j.get(j, 0) + len(c)
    out = []
    for (j, f), members in by_folder.items():
        blob = build_zip_bytes(members)
        out.append(
            {
                "level": "folder", "job_id": j, "folder": f,
                "zip_name": f"{f}.zip", "n_files": len(members),
                "total_bytes": totals_f[(j, f)], "zip_size": len(blob),
                "zip_sha256": hashlib.sha256(blob).hexdigest(),
            }
        )
    for j, members in by_job.items():
        blob = build_zip_bytes(members)
        out.append(
            {
                "level": "job", "job_id": j, "folder": None,
                "zip_name": f"crawl_results_{j}.zip", "n_files": len(members),
                "total_bytes": totals_j[j], "zip_size": len(blob),
                "zip_sha256": hashlib.sha256(blob).hexdigest(),
            }
        )
    return out
