"""File-based streaming hash exchange for fragment→tile builds.

The pixel pipelines that rebuild a target tiling from shipped sub-rectangle
fragments (resample / reproject) are exchange-bound: Ray Data's
``groupby(key).map_groups`` is a sort-based all-to-all whose ingestion
throttles the fragment-emitting map stage, so at 8 CPUs the measured wall
was ~3× the total-CPU/8 lower bound (ds.stats audit, ROUND4_NOTES).

This module replaces that shuffle with the engine's IVF pattern
(``text/ann.ivf_build``): the map side streams fragments straight into
Hive-partitioned Parquet buckets (``bucket = mix64(key) % n_buckets``) at
full width — a write has no all-to-all barrier to backpressure against —
and the reduce side is one task per bucket: read the bucket file(s),
locally group by key (argsort — each bucket holds complete groups by
construction), and run the caller's ``build`` per group. Both phases
stream; the only synchronization is the write action completing before the
bucket listing (semantically required: any source tile may contribute to
any target tile).

Scale contract: ``root`` must be storage every node can read (object
store / shared FS on a real cluster — the same contract as the IVF index
directory). Buckets are the natural resume unit: a re-run can skip bucket
directories whose outputs already carry lineage manifests.

Retry safety: Ray's Parquet writer stages blocks under unique file names,
and duplicate fragments are harmless to the two consumers (window paste
re-writes identical cells), so a retried write task cannot corrupt a
build.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["fragment_exchange", "EXCHANGE_ROOT"]

EXCHANGE_ROOT = "/tmp/graft_exchange"

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier
_STALE_SECS = 1800.0


def _sweep_stale(root: str) -> None:
    """Best-effort GC of exchange dirs older than 30 min. The reduce reads
    its bucket files lazily, so a dir cannot be deleted at the end of its
    own call — instead each NEW exchange sweeps long-dead ones (a bench
    loop would otherwise fill /tmp with fragment bytes)."""
    import shutil
    import time

    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return
    now = time.time()
    for d in entries:
        p = os.path.join(root, d)
        try:
            if now - os.path.getmtime(p) > _STALE_SECS:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Morton keys are spatially correlated — multiply-shift mix before the
    modulo so neighbouring tiles spread across buckets (load balance)."""
    k = keys.astype(np.uint64) * _MIX
    k ^= k >> np.uint64(29)
    return (k % np.uint64(n_buckets)).astype(np.int32)


def fragment_exchange(
    frags,
    build,
    *,
    key: str = "tkey",
    n_buckets: int | None = None,
    root: str = EXCHANGE_ROOT,
    build_batch_format: str = "pyarrow",
):
    """``frags`` (a Dataset of fragment rows) → Dataset of ``build(group)``
    outputs, grouped by ``key``, via a map-side bucket-file exchange.

    ``build`` receives one pyarrow Table per distinct key (same contract as
    ``groupby(key).map_groups(build)``) and must return a pyarrow Table.
    """
    import ray.data

    if n_buckets is None:
        from .cc import auto_shuffle_blocks

        n_buckets = auto_shuffle_blocks(floor=64)
    _sweep_stale(root)
    out_dir = os.path.join(root, uuid.uuid4().hex)

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(keys, n_buckets), pa.int32())
        )

    # map side: stream fragments into Hive-partitioned bucket files at full
    # width (no compression: payloads are float pixel bytes, the reduce
    # re-reads them seconds later through the page cache / object store)
    (
        frags.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .write_parquet(out_dir, partition_cols=["bucket"], compression="none")
    )

    # reduce side: one task per bucket directory — local argsort grouping
    # (each bucket holds every fragment of its keys), then the caller's
    # per-group build. No Ray-level shuffle at all.
    bucket_dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("bucket=")
    )
    if not bucket_dirs:  # zero fragments: empty groupby yields empty output
        return frags.groupby(key).map_groups(build, batch_format=build_batch_format)

    def build_bucket(batch: pa.Table):
        # generator UDF: zero-output buckets (every group built to None —
        # e.g. halo strips aimed at missing tiles of a sparse set) yield
        # nothing instead of forcing an empty table of unknown schema
        for path in batch["item"].to_pylist():
            t = pq.read_table(path)
            if t.num_rows == 0:
                continue
            keys = t[key].to_numpy(zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            t = t.take(pa.array(order))
            ks = keys[order]
            bounds = np.flatnonzero(np.diff(ks)) + 1
            starts = np.concatenate([[0], bounds])
            stops = np.concatenate([bounds, [len(ks)]])
            for lo, hi in zip(starts, stops):
                out = build(t.slice(int(lo), int(hi - lo)))
                if out is not None and out.num_rows:
                    yield out

    items = ray.data.from_items(bucket_dirs, override_num_blocks=len(bucket_dirs))
    return items.map_batches(
        build_bucket,
        batch_format=build_batch_format,
        batch_size=None,
    )
