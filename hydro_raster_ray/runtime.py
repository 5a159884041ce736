"""Ray Data context tuning for the engine's workloads.

Ray's default ``read_op_min_num_blocks`` is 200: every read is split into
at least 200 blocks regardless of size. For the tile tables this is
pathological at small/medium scale — an 85M-px bench mosaic (~1 GB) became
243 blocks of ~0.8 MB, so every downstream ``map_batches`` ran 243 tasks
of ~20 ms (pure dispatch overhead; measured 4.97 s → 1.4 s on the EP1
headline just from this knob). ``tune_context`` lowers the minimum to
2×CPUs — the value Ray's own parallelism heuristic would pick from the
cluster term — while staying SIZE-AWARE at scale: the
``estimated_size / target_max_block_size`` term still dominates for large
inputs (100 TB → ~800k blocks at the 128 MB default), so this only
removes the small-data over-splitting, never caps big reads.

Call it once after ``ray.init`` (bench, tests, CLI) or at import time in
a driver context where Ray is already initialized (``__ray_entry__``).
"""

from __future__ import annotations

__all__ = ["tune_context", "auto_pool"]


def tune_context() -> None:
    import ray
    from ray.data import DataContext

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ctx = DataContext.get_current()
    ctx.read_op_min_num_blocks = min(ctx.read_op_min_num_blocks, max(16, 2 * cpus))


def auto_pool(requested):
    """Cap an actor-pool ``concurrency`` at cpus−2: a pool holding every
    CPU starves its upstream read stage and the pipeline DEADLOCKS
    (reproduced: ``concurrency=4`` on a ``num_cpus=4`` cluster hangs
    forever). Accepts an int or a ``(min, max)`` autoscaling tuple."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(1, cpus - 2)
    if isinstance(requested, tuple):
        lo, hi = requested
        return (max(1, min(lo, cap)), max(1, min(hi, cap)))
    return max(1, min(int(requested), cap))
