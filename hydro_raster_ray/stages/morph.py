"""Grayscale morphology as chained focal passes.

The classic raster/image cleanup operators — erode (3×3 min), dilate
(3×3 max), opening (erode→dilate, removes 1-px bright speckle) and
closing (dilate→erode, fills 1-px dark pits) — expressed as two chained
halo passes over the tiled corpus (``stages/focal.py`` min/max on the
shared 1-px halo machinery of ``stages/halo.py``). The reference's
domain uses the same family for DEM despeckling next to the focal
median (``spatial_analysis.py`` neighborhood ops); here it doubles as
the image-curation despeckle stage of the Lance-shaped tile table.

Semantics (defined by the whole-array witness ``oracle.morph``):
NaN-aware min/max with the window clipped at the grid edge; each pass
FILLS 1-px holes (output NaN only where the whole 3×3 window is NaN)
— focal-family convention, see ``stages/focal.py``.

Exactness: morphology is pure ORDER STATISTICS — every output value is
one of the input values, no arithmetic at all — so the chain is
bit-exact end to end regardless of tiling, summation order, or the
f32 plane round-trip (selections of f32 values are f32 values). That
is why the driver oracle for ``morph_open_stats`` can be a genuinely
independent SQL reproduction (two chained 3×3 self-joins over the
pixel witness) with no rounding epsilon on min/max.

Scale note: the intermediate plane between the two passes is
checkpointed with ``Dataset.materialize()`` — the second pass's halo
collection and window map would otherwise each re-execute the first
pass. The intermediate is exactly one corpus worth of tiles; at the
10¹²-image scale it lives in the object store and spills, which is the
standard cost of any multi-sweep stencil (same trade as
``stages/distance.py`` and the depression-fill iterations).
"""

from __future__ import annotations

from ..sources.tiles import TileSet
from .focal import focal_stats

__all__ = ["morph"]

_OPS = ("erode", "dilate", "open", "close")


def morph(
    ts: TileSet,
    op: str = "open",
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """3×3 grayscale morphology. ``op``: erode | dilate | open | close.

    Single-pass ops are one halo exchange; open/close are two, with the
    intermediate corpus checkpointed between them (see module note).
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    first = "min" if op in ("erode", "open") else "max"
    out = focal_stats(
        ts, first, shuffle_blocks=shuffle_blocks,
        halo_broadcast_budget=halo_broadcast_budget,
    )
    if op in ("erode", "dilate"):
        return out
    mid = TileSet(ds=out.ds.materialize(), grid=out.grid)
    second = "max" if op == "open" else "min"
    return focal_stats(
        mid, second, shuffle_blocks=shuffle_blocks,
        halo_broadcast_budget=halo_broadcast_budget,
    )
