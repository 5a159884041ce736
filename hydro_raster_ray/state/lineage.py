"""Per-partition lineage manifests + resumable output (north-rule gate).

A pipeline sink writes one Parquet directory per cell bucket
(``out/cell_bucket=<b>/``) atomically (temp dir + rename), plus a
``_lineage/<b>.json`` manifest carrying the bucket's input tile ids, row
count, byte count and a content hash. A rerun consults the manifests FIRST
and filters completed buckets out of the input — killed runs resume without
recomputing finished cells, and because every operator is deterministic the
bytes produced on resume equal the bytes a clean run would have produced.

Buckets are the Morton ``cell`` key right-shifted ``2*level`` bits: a
spatial, stable, data-independent partitioning (the same tile always lands
in the same bucket, any cluster size, any retry).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.tiles import INPUT_COLUMNS, TileSet

__all__ = [
    "bucket_of",
    "resumable_write",
    "read_manifests",
    "completed_buckets",
    "drop_completed_targets",
]


def bucket_of(cell: np.ndarray, level: int = 2) -> np.ndarray:
    """Morton cell → coarse bucket id (drop ``level`` quadtree levels)."""
    return np.asarray(cell, dtype=np.int64) >> np.int64(2 * level)


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_buckets(out_dir: str) -> set[int]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            if m.get("complete"):
                out.add(int(m["bucket"]))
    return out


def read_manifests(out_dir: str) -> list[dict]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def drop_completed_targets(ds, out_dir: str, level: int = 2, key: str = "tkey"):
    """Resume filter for SHUFFLE-bearing pipelines: drop rows whose TARGET
    bucket already has a complete manifest in ``out_dir``.

    A map-only pipeline can prune its inputs (``resumable_write``'s filter)
    because input bucket == output bucket; across a scatter shuffle one
    input feeds many output tiles, so the prune must happen on the fragment
    stream instead — each fragment already carries its target Morton cell
    (``key``), which is exactly the output row's ``cell`` and therefore the
    manifest bucket. Dropping completed fragments BEFORE the repartition
    prunes the all-to-all exchange and the per-group build, the two
    expensive stages of a mosaic at 100 TB; the upstream scatter re-runs
    (cheap, map-only) and the recomputed bytes are deterministic, so a
    resumed run's output equals a clean run's.
    """
    done = completed_buckets(out_dir)
    if not done:
        return ds
    done_arr = sorted(done)

    def drop(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[key].to_numpy(zero_copy_only=False), level)
        return batch.filter(pa.array(~np.isin(b, done_arr)))

    return ds.map_batches(drop, batch_format="pyarrow", batch_size=None)


def resumable_write(ts: TileSet, out_dir: str, level: int = 2) -> dict:
    """Write the TileSet as bucket-partitioned Parquet with lineage.

    Returns counters {written_buckets, skipped_buckets, rows_written}.
    The write stage itself runs inside ``map_batches``: each task groups its
    batch rows by bucket and appends one part file per (bucket, block),
    written atomically; the manifest for a bucket is finalized on the driver
    after the full pass (a bucket is complete only when the pass that
    produced part files for it finished), so a kill mid-run leaves either
    no manifest (bucket recomputed on resume) or a complete one (skipped).
    """
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    done = completed_buckets(out_dir)

    # resume filter: drop tiles whose bucket is already complete — metadata
    # predicate, no decode
    if done:
        done_arr = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            b = bucket_of(batch["cell"].to_numpy(zero_copy_only=False), level)
            keep = ~np.isin(b, done_arr)
            return batch.filter(pa.array(keep))

        ds = ts.ds.map_batches(drop_done, batch_format="pyarrow", batch_size=None)
    else:
        ds = ts.ds

    def write_parts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "rows": pa.array([], pa.int64()),
                 "bytes": pa.array([], pa.int64()),
                 "content": pa.array([], pa.string()),
                 "tile_ids": pa.array([], pa.list_(pa.string()))}
            )
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        buckets = bucket_of(cells, level)
        rows = []
        for b in np.unique(buckets):
            sel = batch.filter(pa.array(buckets == b)).select(INPUT_COLUMNS)
            bdir = os.path.join(out_dir, f"cell_bucket={int(b)}")
            os.makedirs(bdir, exist_ok=True)
            ids = sorted(sel["image_id"].to_pylist())
            content = hashlib.blake2b(
                ("|".join(ids)).encode()
                + np.sort(sel["phash"].to_numpy(zero_copy_only=False)).tobytes(),
                digest_size=8,
            ).hexdigest()
            fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".tmp")
            os.close(fd)
            pq.write_table(sel, tmp)
            os.replace(tmp, os.path.join(bdir, f"part-{content}.parquet"))
            rows.append(
                {
                    "bucket": int(b),
                    "rows": sel.num_rows,
                    "bytes": sum(len(x) for x in sel["bytes"].to_pylist()),
                    "content": content,
                    "tile_ids": ids,
                }
            )
        return pa.table(
            {
                "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
                "rows": pa.array([r["rows"] for r in rows], pa.int64()),
                "bytes": pa.array([r["bytes"] for r in rows], pa.int64()),
                "content": pa.array([r["content"] for r in rows], pa.string()),
                "tile_ids": pa.array([r["tile_ids"] for r in rows],
                                     pa.list_(pa.string())),
            }
        )

    stats = ds.map_batches(write_parts, batch_format="pyarrow", batch_size=None)
    per_bucket: dict[int, dict] = {}
    rows_written = 0
    for b in stats.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            bk = b["bucket"][i].as_py()
            m = per_bucket.setdefault(
                bk, {"bucket": bk, "rows": 0, "bytes": 0, "parts": [],
                     "tile_ids": []}
            )
            m["rows"] += b["rows"][i].as_py()
            m["bytes"] += b["bytes"][i].as_py()
            m["parts"].append(b["content"][i].as_py())
            m["tile_ids"].extend(b["tile_ids"][i].as_py())
            rows_written += b["rows"][i].as_py()
    # finalize manifests (atomic per bucket)
    for bk, m in per_bucket.items():
        m["complete"] = True
        m["tile_ids"] = sorted(m["tile_ids"])
        m["parts"] = sorted(m["parts"])
        path = os.path.join(_manifest_dir(out_dir), f"{bk}.json")
        fd, tmp = tempfile.mkstemp(dir=_manifest_dir(out_dir), suffix=".tmp")
        os.close(fd)
        with open(tmp, "w") as f:
            json.dump(m, f, sort_keys=True)
        os.replace(tmp, path)
    return {
        "written_buckets": len(per_bucket),
        "skipped_buckets": len(done),
        "rows_written": rows_written,
    }
