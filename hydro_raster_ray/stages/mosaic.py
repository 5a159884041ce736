"""Mosaic / regrid shuffles — the wide operators of the engine.

Two kernels cover the reference's whole multi-grid family (SURVEY.md §2.6):

**Scatter** (``merge_into``): origin tiles are re-keyed to the target tiling
by a ``flat_map``-style fragment emission, then one hash-partitioned
``groupby(target cell).map_groups(paste)`` assembles each target tile.
Implements ``merge`` (``Raster.py:873-895``: NaN-skip scatter, origin
overwrites target), ``combine_raster`` (``spatial_analysis.py:244-298``:
union-extent canvas, whole-block paste INCLUDING NaN, later files overwrite
earlier) and ``paste_on`` (``Raster.py:517-551``, including its ``> 0``
boundary quirk at ``Raster.py:539-541``).

**Gather** (``regrid_nearest``): each target tile pulls its
nearest-neighbour source pixels. Source tiles emit exactly the sub-rectangle
each target tile needs (a range join on tile indices computed arithmetically
— no driver-side tile map), the same groupby assembles a source window, and
the reference's ``map2sub`` rounding picks the pixel. Implements
``assign_to`` (``Raster.py:489-515``, border-clamped) and
``grid_resample_nearest`` (``Raster.py:457-487``, floor'd dims).

Scale notes: the shuffle key is the target tile's Morton cell, so
neighbouring tiles hash to nearby partitions; overwrite order is a
``prio`` column sorted inside each group — deterministic under any task
order/retry. Uncovered target tiles are simply absent (sparse mosaic): a
NaN tile is never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode, phash64
from ..grid import GridSpec, TileScheme, map2sub, morton_encode, tile_id
from ..sources.tiles import TileSet
from .cc import auto_shuffle_blocks
from .decode import iter_tiles

__all__ = [
    "merge_into",
    "merge_stack",
    "combine_mosaic",
    "paste_on",
    "regrid_nearest",
    "grid_resample_nearest",
    "assign_to",
    "dedup_exact",
    "phash_near_dups",
    "top_k_tiles",
    "intersect_tiles",
    "except_tiles",
    "sample_tiles",
    "pack_shards",
]

_FRAG_FIELDS = [
    ("tkey", pa.int64()),
    ("t_tr", pa.int32()),
    ("t_tc", pa.int32()),
    ("prio", pa.int64()),
    ("fr0", pa.int32()),  # fragment origin row within the TARGET tile
    ("fc0", pa.int32()),
    ("fh", pa.int32()),
    ("fw", pa.int32()),
    ("payload", pa.binary()),  # raw-f32 fragment pixels
    ("src_r0", pa.int32()),  # fragment origin in SOURCE global pixels (gather)
    ("src_c0", pa.int32()),
]
_FRAG_SCHEMA = pa.schema(_FRAG_FIELDS)


def _empty_frags() -> pa.Table:
    return pa.table(
        {name: pa.array([], type=t) for name, t in _FRAG_FIELDS}, schema=_FRAG_SCHEMA
    )


def _frag_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return _empty_frags()
    return pa.table(
        {name: pa.array([r[name] for r in rows], type=t) for name, t in _FRAG_FIELDS},
        schema=_FRAG_SCHEMA,
    )


def _scatter_tile(
    arr: np.ndarray,
    xll: float,
    yll: float,
    cellsize: float,
    target: TileScheme,
    prio: int,
    quirk_gt0: bool,
    out: list[dict],
) -> None:
    """Emit one origin tile's fragments keyed by target tile (equal-cellsize
    paste). The target row of origin row k is R0 + k where R0 comes from the
    reference's ``map2sub`` of the origin tile's top-left cell centre
    (constant offset — exact because the cellsizes are equal)."""
    tg = target.grid
    h, w = arr.shape
    x0 = xll + 0.5 * cellsize
    y0 = yll + (h - 0.5) * cellsize
    R0a, C0a = map2sub(np.array([x0]), np.array([y0]), tg)
    R0, C0 = int(R0a[0]), int(C0a[0])
    # origin rows k ∈ [0, h): keep those landing inside the target
    lo = 1 if quirk_gt0 else 0
    k_r = np.arange(h)
    k_c = np.arange(w)
    ok_r = (R0 + k_r >= lo) & (R0 + k_r <= tg.nrows - 1)
    ok_c = (C0 + k_c >= lo) & (C0 + k_c <= tg.ncols - 1)
    if not ok_r.any() or not ok_c.any():
        return
    kr0, kr1 = int(k_r[ok_r][0]), int(k_r[ok_r][-1]) + 1
    kc0, kc1 = int(k_c[ok_c][0]), int(k_c[ok_c][-1]) + 1
    sub = arr[kr0:kr1, kc0:kc1]
    gr0_t = R0 + kr0  # target global pixel origin of the kept block
    gc0_t = C0 + kc0
    for t_tr, t_tc in target.tiles_overlapping_rc(
        gr0_t, gr0_t + sub.shape[0], gc0_t, gc0_t + sub.shape[1]
    ):
        tr0_px, tc0_px = target.tile_origin_rc(t_tr, t_tc)
        th, tw = target.tile_shape(t_tr, t_tc)
        a0 = max(gr0_t, tr0_px)
        a1 = min(gr0_t + sub.shape[0], tr0_px + th)
        b0 = max(gc0_t, tc0_px)
        b1 = min(gc0_t + sub.shape[1], tc0_px + tw)
        frag = sub[a0 - gr0_t : a1 - gr0_t, b0 - gc0_t : b1 - gc0_t]
        out.append(
            {
                "tkey": int(morton_encode(t_tr, t_tc)),
                "t_tr": t_tr,
                "t_tc": t_tc,
                "prio": prio,
                "fr0": a0 - tr0_px,
                "fc0": b0 - tc0_px,
                "fh": frag.shape[0],
                "fw": frag.shape[1],
                "payload": encode(frag, "raw-f32"),
                "src_r0": 0,
                "src_c0": 0,
            }
        )


def _scatter_batch(
    batch: pa.Table,
    grid: GridSpec,
    target: TileScheme,
    prio: int,
    quirk_gt0: bool,
) -> pa.Table:
    """One TileSet layer → fragments (see ``_scatter_tile``)."""
    tg = target.grid
    if abs(grid.cellsize - tg.cellsize) > 1e-12:
        raise ValueError(
            "scatter paste requires equal cellsize; resample first "
            "(Raster.py:884-886 / spatial_analysis.py:248-249 semantics)"
        )
    out: list[dict] = []
    # f32 planes: value-preserving scatter, lossless by codec contract
    for info, arr in iter_tiles(batch, grid, dtype=np.float32):
        spec = info.spec
        _scatter_tile(
            arr, spec.xllcorner, spec.yllcorner, spec.cellsize, target,
            prio, quirk_gt0, out,
        )
    return _frag_table(out)


def _tile_row_from_group(g: pa.Table, target: TileScheme, ignore_nan: bool):
    """Paste one target tile's fragments in prio order → (h, w) canvas.

    Field extraction is vectorized and payloads are zero-copy Arrow views —
    the per-fragment Python work is just the paste slice itself, which
    matters for deep (hot-cell) groups."""
    from .decode import _payload_views

    order = np.argsort(g["prio"].to_numpy(zero_copy_only=False), kind="stable")
    t_tr = int(g["t_tr"][0].as_py())
    t_tc = int(g["t_tc"][0].as_py())
    fr0s = g["fr0"].to_numpy(zero_copy_only=False)
    fc0s = g["fc0"].to_numpy(zero_copy_only=False)
    fhs = g["fh"].to_numpy(zero_copy_only=False)
    fws = g["fw"].to_numpy(zero_copy_only=False)
    bufs = _payload_views(g, column="payload")
    th, tw = target.tile_shape(t_tr, t_tc)
    canvas = np.full((th, tw), np.nan, dtype=np.float32)
    for i in order:
        i = int(i)
        fr0, fc0, fh, fw = fr0s[i], fc0s[i], fhs[i], fws[i]
        frag = decode(bufs[i], fh, fw, "raw-f32", dtype=np.float32)
        if ignore_nan:
            dest = canvas[fr0 : fr0 + fh, fc0 : fc0 + fw]
            m = ~np.isnan(frag)
            dest[m] = frag[m]
        else:
            canvas[fr0 : fr0 + fh, fc0 : fc0 + fw] = frag
    return t_tr, t_tc, canvas


def _emit_tile_row(t_tr: int, t_tc: int, canvas: np.ndarray, target: TileScheme) -> pa.Table:
    tg = target.grid
    img = tile_id(t_tr, t_tc)
    buf = encode(canvas, "raw-f32")
    truth = decode(buf, *canvas.shape, "raw-f32")
    return pa.table(
        {
            "image_id": pa.array([img], pa.string()),
            "bytes": pa.array([buf], pa.binary()),
            "w": pa.array([canvas.shape[1]], pa.int32()),
            "h": pa.array([canvas.shape[0]], pa.int32()),
            "fmt": pa.array(["raw-f32"], pa.string()),
            "caption": pa.array(
                [f"DEM tile {img} cellsize={tg.cellsize} crs={tg.crs}"],
                pa.string(),
            ),
            "phash": pa.array([phash64(truth)], pa.int64()),
            "tile_row": pa.array([t_tr], pa.int32()),
            "tile_col": pa.array([t_tc], pa.int32()),
            "gr0": pa.array([t_tr * target.tile_h], pa.int32()),
            "gc0": pa.array([t_tc * target.tile_w], pa.int32()),
            "cell": pa.array([int(morton_encode(t_tr, t_tc))], pa.int64()),
        }
    )


def _tiles_from_groups(target: TileScheme, ignore_nan: bool):
    def build(g: pa.Table) -> pa.Table:
        t_tr, t_tc, canvas = _tile_row_from_group(g, target, ignore_nan)
        return _emit_tile_row(t_tr, t_tc, canvas, target)

    return build


# ---------------------------------------------------------------------------
# Hot-cell salting: two-level combine for many-layer merges
# ---------------------------------------------------------------------------
#
# With L input layers overlapping the same region (the coastal/boundary skew
# case: hundreds of survey DEMs stacked on one shore cell), the single-level
# groupby(tkey) hands ONE task all L fragments of a hot target cell. Salting
# splits each cell's paste into ceil(L / salt_width) PRIO-RANGE sub-groups —
# same-layer fragments are spatially disjoint (a tiling), so last-wins order
# only matters ACROSS layers, and a contiguous prio range pre-pastes into a
# partial canvas that composes associatively: final = paste partials in range
# order. Level 1 runs one bounded task per (cell, salt); level 2 sees at most
# n_salts full-tile partials per cell instead of L fragments.
#
# Crossover (measured, 64-layer 512² stack, 32 CPUs): the salted plan costs
# one extra sort shuffle + a partials pass (~2.5x wall at that depth), so it
# is NOT a wall-time win for shallow stacks — it is the TASK-MEMORY and
# straggler bound: map_groups materializes each group in one task, so an
# unsalted 10k-layer coastal cell is a multi-GB single-task group. Hence the
# default salt_width=64 (salting engages above 64 layers, where per-group
# bytes — not shuffle constants — dominate).


def _partials_from_groups(target: TileScheme, ignore_nan: bool, need_mask: bool):
    """Level-1 salted combine: one skey group → one full-tile partial frag.

    ``need_mask`` (paste_blocks mode, NaN overwrites): emit a packbits
    touched-mask so the final paste can write NaN cells; otherwise NaN in
    the partial means "untouched or skipped" and the final paste NaN-skips."""

    def build(g: pa.Table) -> pa.Table:
        t_tr, t_tc, canvas = _tile_row_from_group(g, target, ignore_nan)
        salt = int(g["salt"][0].as_py())  # constant within an skey group
        mask = b""
        if need_mask:
            touched = np.zeros(canvas.shape, dtype=bool)
            fr0 = g["fr0"].to_numpy(zero_copy_only=False)
            fc0 = g["fc0"].to_numpy(zero_copy_only=False)
            fh = g["fh"].to_numpy(zero_copy_only=False)
            fw = g["fw"].to_numpy(zero_copy_only=False)
            for i in range(len(g)):
                touched[fr0[i] : fr0[i] + fh[i], fc0[i] : fc0[i] + fw[i]] = True
            mask = np.packbits(touched).tobytes()
        return pa.table(
            {
                "tkey": pa.array([int(g["tkey"][0].as_py())], pa.int64()),
                "t_tr": pa.array([t_tr], pa.int32()),
                "t_tc": pa.array([t_tc], pa.int32()),
                "prio": pa.array([salt], pa.int64()),
                "fh": pa.array([canvas.shape[0]], pa.int32()),
                "fw": pa.array([canvas.shape[1]], pa.int32()),
                "payload": pa.array([encode(canvas, "raw-f32")], pa.binary()),
                "mask": pa.array([mask], pa.binary()),
            }
        )

    return build


def _tiles_from_partials(target: TileScheme):
    """Level-2 combine: paste full-tile partial canvases in salt order."""

    def build(g: pa.Table) -> pa.Table:
        order = np.argsort(g["prio"].to_numpy(zero_copy_only=False), kind="stable")
        t_tr = int(g["t_tr"][0].as_py())
        t_tc = int(g["t_tc"][0].as_py())
        th, tw = target.tile_shape(t_tr, t_tc)
        canvas = np.full((th, tw), np.nan, dtype=np.float32)
        for i in order:
            i = int(i)
            part = decode(
                g["payload"][i].as_py(), th, tw, "raw-f32", dtype=np.float32
            )
            mb = g["mask"][i].as_py()
            if mb:
                m = np.unpackbits(
                    np.frombuffer(mb, dtype=np.uint8), count=th * tw
                ).astype(bool).reshape(th, tw)
            else:
                m = ~np.isnan(part)
            canvas[m] = part[m]
        return _emit_tile_row(t_tr, t_tc, canvas, target)

    return build


def merge_into(
    origins: list[TileSet],
    target: TileSet | TileScheme,
    ignore_nan: bool = True,
    paste_blocks: bool = False,
    quirk_gt0: bool = False,
    shuffle_blocks: int | None = None,
    resume_out_dir: str | None = None,
    resume_level: int = 2,
    salt_width: int = 64,
    exchange: str = "files",
) -> TileSet:
    """The scatter-shuffle paste. Origins are pasted in list order (later
    overwrites earlier); an existing target TileSet forms the base layer
    (prio −1). ``ignore_nan=True`` skips NaN origin cells (``merge``);
    ``paste_blocks=True`` forces whole-block overwrite including NaN
    (``combine_raster``); ``quirk_gt0`` mirrors ``paste_on``'s ``> 0``
    boundary filter.

    ``resume_out_dir``: checkpoint-resume across the shuffle boundary —
    fragments aimed at output buckets that already have a complete lineage
    manifest under this directory are dropped BEFORE the repartition, so a
    resumed run skips the exchange+build work for finished cells (pair with
    ``state.lineage.resumable_write`` on the same directory).

    ``salt_width``: hot-cell salting threshold — when more than this many
    layers are merged, the per-cell paste runs as a salted two-level combine
    (one bounded task per ceil(layers/salt_width) prio-range sub-group per
    cell, then a tiny per-cell merge of the partials). Decided at plan time
    from the layer count; ≤ salt_width layers keeps the single-level path."""
    if isinstance(target, TileSet):
        # the existing target is the base layer: scatter it onto its own
        # tiling at prio −1 (identity fragments), origins overwrite it
        t_scheme = TileScheme(grid=target.grid, tile_h=64, tile_w=64)
        layers = [(target, -1, False)]
    else:
        t_scheme = target
        layers = []
    layers += [(o, i, quirk_gt0 and not paste_blocks) for i, o in enumerate(origins)]

    frag_sets = []
    for o, prio, quirk in layers:
        def scatter(batch, _g=o.grid, _p=prio, _q=quirk):
            return _scatter_batch(batch, _g, t_scheme, _p, _q)

        frag_sets.append(o.ds.map_batches(scatter, batch_format="pyarrow", batch_size=None))
    frags = frag_sets[0]
    for f in frag_sets[1:]:
        frags = frags.union(f)
    if resume_out_dir is not None:
        from ..state.lineage import drop_completed_targets

        frags = drop_completed_targets(
            frags, resume_out_dir, level=resume_level, key="tkey"
        )
    # coalesce fragment blocks before the sort shuffle: the range-partition
    # cost grows with block count, and scatter emits many small blocks
    # (measured 5-6x faster groupby at 64 blocks vs per-scatter blocks);
    # width sized to the cluster, not a fixed constant
    return _combine_frags(
        frags,
        t_scheme,
        paste_nan_skip=ignore_nan and not paste_blocks,
        n_layers=len(layers),
        min_prio=min(p for _o, p, _q in layers),
        salt_width=salt_width,
        shuffle_blocks=shuffle_blocks,
        exchange=exchange,
    )


def _add_skey_fn(n_salts: int, salt_width: int, min_prio: int):
    """Vectorized (salt, skey) column append for the salted two-level paste.

    layer_idx ∈ [0, n_layers): shift by the minimum prio (−1 when an
    existing-target base layer is present, else 0). Out-of-range layer
    values CLAMP into the boundary salts (still pasted in prio order inside
    the level-1 group — correct, just less parallel) instead of colliding
    with a neighbour cell's skey space."""

    def add_skey(t: pa.Table) -> pa.Table:
        tkey = t["tkey"].to_numpy(zero_copy_only=False)
        layer_idx = t["prio"].to_numpy(zero_copy_only=False) - min_prio
        salt = np.clip(layer_idx // salt_width, 0, n_salts - 1)
        t = t.append_column("salt", pa.array(salt.astype(np.int64), pa.int64()))
        return t.append_column(
            "skey", pa.array(tkey * n_salts + salt, pa.int64())
        )

    return add_skey


def _combine_frags(
    frags,
    t_scheme: TileScheme,
    paste_nan_skip: bool,
    n_layers: int,
    min_prio: int,
    salt_width: int,
    shuffle_blocks: int | None,
    exchange: str = "sort",
) -> TileSet:
    """Shared fragment→tile combine: single-level groupby(tkey) for shallow
    stacks, salted two-level for deep ones (plan-time decision).

    ``exchange="files"`` swaps the groupby sort for the map-side
    bucket-file exchange (``stages/exchange.py``): fragments stream into
    Hive-partitioned bucket files at full width and each bucket builds in
    one task. Paste order stays deterministic — the group builders sort by
    ``prio`` inside each group, and duplicate fragments from a retried
    write are idempotent under that order."""
    n_salts = -(-n_layers // max(salt_width, 1))
    if exchange == "files":
        from .exchange import fragment_exchange

        if n_salts <= 1:
            built = fragment_exchange(
                frags, _tiles_from_groups(t_scheme, paste_nan_skip), key="tkey"
            )
            return TileSet(ds=built, grid=t_scheme.grid)
        frags = frags.map_batches(
            _add_skey_fn(n_salts, salt_width, min_prio),
            batch_format="pyarrow", batch_size=None,
        )
        partials = fragment_exchange(
            frags,
            _partials_from_groups(
                t_scheme, paste_nan_skip, need_mask=not paste_nan_skip
            ),
            key="skey",
        )
        built = fragment_exchange(
            partials, _tiles_from_partials(t_scheme), key="tkey"
        )
        return TileSet(ds=built, grid=t_scheme.grid)
    if shuffle_blocks is None:
        shuffle_blocks = auto_shuffle_blocks(floor=64)
    frags = frags.repartition(shuffle_blocks)
    if n_salts <= 1:
        built = frags.groupby("tkey").map_groups(
            _tiles_from_groups(t_scheme, paste_nan_skip),
            batch_format="pyarrow",
        )
        return TileSet(ds=built, grid=t_scheme.grid)

    # hot-cell salting (see the two-level combine note above): prio-range
    # salt, vectorized key append, two groupbys — level 2 moves at most
    # n_salts full-tile partials per cell regardless of layer count
    frags = frags.map_batches(
        _add_skey_fn(n_salts, salt_width, min_prio),
        batch_format="pyarrow", batch_size=None,
    )
    partials = frags.groupby("skey").map_groups(
        _partials_from_groups(t_scheme, paste_nan_skip, need_mask=not paste_nan_skip),
        batch_format="pyarrow",
    )
    built = partials.groupby("tkey").map_groups(
        _tiles_from_partials(t_scheme), batch_format="pyarrow"
    )
    return TileSet(ds=built, grid=t_scheme.grid)


def merge_stack(
    ds,
    target: TileScheme,
    n_layers: int,
    layer_col: str = "layer",
    ignore_nan: bool = True,
    paste_blocks: bool = False,
    quirk_gt0: bool = False,
    salt_width: int = 64,
    shuffle_blocks: int | None = None,
    exchange: str = "files",
) -> TileSet:
    """Deep-stack merge from ONE dataset of independently-georeferenced tiles
    — the scalable form of ``merge_into`` when the layer count is large: a
    1000-survey coastal mosaic is one table scan with a ``layer`` priority
    column, not 1000 Datasets union-ed into a 2000-operator plan.

    ``ds`` rows carry the input_hint tile columns plus ``xll``, ``yll``
    (world origin of the tile's lower-left corner; equal cellsize with the
    target) and ``layer_col`` (paste priority — higher overwrites lower,
    ties must be spatially disjoint). ``n_layers`` is the plan-time stack
    height used for the hot-cell salt decision (see ``merge_into``)."""
    tg = target.grid

    def scatter(batch: pa.Table) -> pa.Table:
        from .decode import _payload_views

        bufs = _payload_views(batch)
        hs = batch["h"].to_pylist()
        ws = batch["w"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        xlls = batch["xll"].to_pylist()
        ylls = batch["yll"].to_pylist()
        prios = batch[layer_col].to_pylist()
        out: list[dict] = []
        for i in range(batch.num_rows):
            arr = decode(bufs[i], hs[i], ws[i], fmts[i], dtype=np.float32)
            _scatter_tile(
                arr, xlls[i], ylls[i], tg.cellsize, target,
                int(prios[i]), quirk_gt0, out,
            )
        return _frag_table(out)

    frags = ds.map_batches(scatter, batch_format="pyarrow", batch_size=None)
    return _combine_frags(
        frags,
        target,
        paste_nan_skip=ignore_nan and not paste_blocks,
        n_layers=n_layers,
        min_prio=0,
        salt_width=salt_width,
        shuffle_blocks=shuffle_blocks,
        exchange=exchange,
    )


def paste_on(small: TileSet, large: TileSet, ignore_nan: bool = True) -> TileSet:
    """``Raster.paste_on`` (``Raster.py:517-551``): paste the small mosaic
    onto the large one (equal cellsize required), preserving the reference's
    ``rows > 0`` / ``cols > 0`` boundary quirk (``Raster.py:539-541``)."""
    return merge_into([small], large, ignore_nan=ignore_nan, quirk_gt0=True)


def combine_mosaic(
    inputs: list[TileSet], tile_h: int = 64, tile_w: int = 64
) -> TileSet:
    """``combine_raster`` (``spatial_analysis.py:244-298``): union-extent
    canvas; each input block-pasted IN ORDER (later files overwrite earlier,
    NaN included — the reference's whole-block assignment at
    ``spatial_analysis.py:288-295``); NODATA canvas → NaN at the end (here:
    uncovered tiles are simply absent — sparse NaN)."""
    cs = inputs[0].grid.cellsize
    for ts in inputs[1:]:
        if abs(ts.grid.cellsize - cs) > 1e-12:
            raise ValueError("combine_mosaic requires equal cellsize inputs")
    extents = [ts.grid.extent for ts in inputs]
    x_min = min(e[0] for e in extents)
    x_max = max(e[1] for e in extents)
    y_min = min(e[2] for e in extents)
    y_max = max(e[3] for e in extents)
    # reference dims use int() truncation (spatial_analysis.py:276-277)
    union = GridSpec(
        ncols=int((x_max - x_min) / cs),
        nrows=int((y_max - y_min) / cs),
        xllcorner=x_min,
        yllcorner=y_min,
        cellsize=cs,
        nodata=inputs[0].grid.nodata,
        crs=inputs[0].grid.crs,
    )
    scheme = TileScheme(grid=union, tile_h=tile_h, tile_w=tile_w)
    return merge_into(inputs, scheme, paste_blocks=True)


# ---------------------------------------------------------------------------
# Gather shuffle: nearest-neighbour regrid
# ---------------------------------------------------------------------------


def _axis_map(src: GridSpec, tg: GridSpec, axis: str, t_idx: np.ndarray) -> np.ndarray:
    """Reference map2sub of the target cell centres along one axis."""
    if axis == "row":
        top_t = tg.yllcorner + tg.nrows * tg.cellsize
        Y = top_t - (t_idx + 0.5) * tg.cellsize
        X = np.full_like(Y, src.xllcorner + 0.5 * src.cellsize)
        r, _ = map2sub(X, Y, src)
        return r
    left_t = tg.xllcorner
    X = left_t + (t_idx + 0.5) * tg.cellsize
    Y = np.full_like(X, src.yllcorner + 0.5 * src.cellsize)
    _, c = map2sub(X, Y, src)
    return c


def _candidate_targets(src: GridSpec, tg: GridSpec, axis: str, g0: int, g1: int,
                       at_low_border: bool, at_high_border: bool, clamp: bool):
    """Target indices t whose (optionally clamped) nearest source index lies
    in [g0, g1). Solved arithmetically with a ±2 margin then exact-filtered
    with the reference rounding itself."""
    if axis == "row":
        y0s = src.yllcorner + (src.nrows - 0.5) * src.cellsize
        top_t = tg.yllcorner + tg.nrows * tg.cellsize
        alpha = (y0s - top_t + 0.5 * tg.cellsize) / src.cellsize
        n_t = tg.nrows
    else:
        x0s = src.xllcorner + 0.5 * src.cellsize
        alpha = (tg.xllcorner + 0.5 * tg.cellsize - x0s) / src.cellsize
        n_t = tg.ncols
    beta = tg.cellsize / src.cellsize
    t_lo = int(np.floor((g0 - 0.5 - alpha) / beta)) - 2
    t_hi = int(np.ceil((g1 - 0.5 - alpha) / beta)) + 2
    if clamp and at_low_border:
        t_lo = 0
    if clamp and at_high_border:
        t_hi = n_t - 1
    t_lo = max(t_lo, 0)
    t_hi = min(t_hi, n_t - 1)
    if t_hi < t_lo:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    t = np.arange(t_lo, t_hi + 1, dtype=np.int64)
    s = _axis_map(src, tg, axis, t)
    if clamp:
        n_s = src.nrows if axis == "row" else src.ncols
        s = np.clip(s, 0, n_s - 1)
    keep = (s >= g0) & (s < g1)
    return t[keep], s[keep]


def _gather_from_groups(target: TileScheme, src: GridSpec, clamp: bool):
    tg = target.grid

    def build(g: pa.Table) -> pa.Table:
        t_tr = int(g["t_tr"][0].as_py())
        t_tc = int(g["t_tc"][0].as_py())
        th, tw = target.tile_shape(t_tr, t_tc)
        tr0, tc0 = target.tile_origin_rc(t_tr, t_tc)
        # source indices this target tile gathers (reference rounding)
        sr = _axis_map(src, tg, "row", np.arange(tr0, tr0 + th, dtype=np.int64))
        sc = _axis_map(src, tg, "col", np.arange(tc0, tc0 + tw, dtype=np.int64))
        if clamp:
            sr = np.clip(sr, 0, src.nrows - 1)
            sc = np.clip(sc, 0, src.ncols - 1)
        # assemble the source window from fragments
        r0s = g["src_r0"].to_numpy(zero_copy_only=False)
        c0s = g["src_c0"].to_numpy(zero_copy_only=False)
        fhs = g["fh"].to_numpy(zero_copy_only=False)
        fws = g["fw"].to_numpy(zero_copy_only=False)
        win_r0 = int(r0s.min())
        win_c0 = int(c0s.min())
        win_r1 = int((r0s + fhs).max())
        win_c1 = int((c0s + fws).max())
        # f32 window: nearest regrid is a pure gather — value-preserving
        win = np.full((win_r1 - win_r0, win_c1 - win_c0), np.nan, dtype=np.float32)
        from .decode import _payload_views

        bufs = _payload_views(g, column="payload")
        for i in range(g.num_rows):
            frag = decode(
                bufs[i], int(fhs[i]), int(fws[i]), "raw-f32",
                dtype=np.float32,
            )
            rr = int(r0s[i]) - win_r0
            cc = int(c0s[i]) - win_c0
            win[rr : rr + int(fhs[i]), cc : cc + int(fws[i])] = frag
        ri = np.clip(sr - win_r0, 0, win.shape[0] - 1)
        ci = np.clip(sc - win_c0, 0, win.shape[1] - 1)
        canvas = win[np.ix_(ri, ci)]
        img = tile_id(t_tr, t_tc)
        buf = encode(canvas, "raw-f32")
        truth = decode(buf, *canvas.shape, "raw-f32")
        return pa.table(
            {
                "image_id": pa.array([img], pa.string()),
                "bytes": pa.array([buf], pa.binary()),
                "w": pa.array([canvas.shape[1]], pa.int32()),
                "h": pa.array([canvas.shape[0]], pa.int32()),
                "fmt": pa.array(["raw-f32"], pa.string()),
                "caption": pa.array(
                    [f"DEM tile {img} cellsize={tg.cellsize} crs={tg.crs}"],
                    pa.string(),
                ),
                "phash": pa.array([phash64(truth)], pa.int64()),
                "tile_row": pa.array([t_tr], pa.int32()),
                "tile_col": pa.array([t_tc], pa.int32()),
                "gr0": pa.array([t_tr * target.tile_h], pa.int32()),
                "gc0": pa.array([t_tc * target.tile_w], pa.int32()),
                "cell": pa.array([int(morton_encode(t_tr, t_tc))], pa.int64()),
            }
        )

    return build


def regrid_nearest(
    ts: TileSet,
    new_spec: GridSpec,
    tile_h: int = 64,
    tile_w: int = 64,
    clamp: bool = True,
    shuffle_blocks: int | None = None,
    exchange: str = "files",
) -> TileSet:
    """Nearest-neighbour regrid onto an arbitrary new header — the gather
    shuffle shared by ``assign_to`` (clamp=True: border values extend
    outward, ``Raster.py:505-508``) and ``grid_resample_nearest``. Each
    source tile ships only the sub-rectangles the target tiles actually
    gather (a few KB per (source, target) pair)."""
    src = ts.grid
    target = TileScheme(grid=new_spec, tile_h=tile_h, tile_w=tile_w)
    grid = ts.grid

    def emit(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            g0r, g1r = info.gr0, info.gr0 + info.h
            g0c, g1c = info.gc0, info.gc0 + info.w
            t_rows, s_rows = _candidate_targets(
                src, new_spec, "row", g0r, g1r,
                at_low_border=(g0r == 0), at_high_border=(g1r == src.nrows),
                clamp=clamp,
            )
            t_cols, s_cols = _candidate_targets(
                src, new_spec, "col", g0c, g1c,
                at_low_border=(g0c == 0), at_high_border=(g1c == src.ncols),
                clamp=clamp,
            )
            if t_rows.size == 0 or t_cols.size == 0:
                continue
            # group the needed target indices by target tile
            tt_r = t_rows // target.tile_h
            tt_c = t_cols // target.tile_w
            for utr in np.unique(tt_r):
                sel_r = s_rows[tt_r == utr]
                fr0, fr1 = int(sel_r.min()), int(sel_r.max()) + 1
                for utc in np.unique(tt_c):
                    sel_c = s_cols[tt_c == utc]
                    fc0, fc1 = int(sel_c.min()), int(sel_c.max()) + 1
                    frag = arr[fr0 - g0r : fr1 - g0r, fc0 - g0c : fc1 - g0c]
                    out.append(
                        {
                            "tkey": int(morton_encode(int(utr), int(utc))),
                            "t_tr": int(utr),
                            "t_tc": int(utc),
                            "prio": 0,
                            "fr0": 0,
                            "fc0": 0,
                            "fh": frag.shape[0],
                            "fw": frag.shape[1],
                            "payload": encode(frag, "raw-f32"),
                            "src_r0": fr0,
                            "src_c0": fc0,
                        }
                    )
        return _frag_table(out)

    frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    if exchange == "files":
        from .exchange import fragment_exchange

        built = fragment_exchange(
            frags, _gather_from_groups(target, src, clamp), key="tkey"
        )
        return TileSet(ds=built, grid=new_spec)
    if shuffle_blocks is None:
        shuffle_blocks = auto_shuffle_blocks(floor=64)
    frags = frags.repartition(shuffle_blocks)  # see merge_into
    built = frags.groupby("tkey").map_groups(
        _gather_from_groups(target, src, clamp), batch_format="pyarrow"
    )
    return TileSet(ds=built, grid=new_spec)


def assign_to(ts: TileSet, new_spec: GridSpec, **kw) -> TileSet:
    """``Raster.assign_to`` (``Raster.py:489-515``): nearest gather onto an
    arbitrary header, clamped at the source borders."""
    return regrid_nearest(ts, new_spec, clamp=True, **kw)


def grid_resample_nearest(ts: TileSet, newsize, **kw) -> TileSet:
    """``Raster.grid_resample_nearest`` (``Raster.py:457-487``): new dims by
    ``floor`` of the size ratio, nearest gather."""
    if isinstance(newsize, GridSpec):
        new_spec = newsize
    else:
        g = ts.grid
        new_spec = GridSpec(
            ncols=int(np.floor(g.cellsize * g.ncols / newsize)),
            nrows=int(np.floor(g.cellsize * g.nrows / newsize)),
            xllcorner=g.xllcorner,
            yllcorner=g.yllcorner,
            cellsize=float(newsize),
            nodata=g.nodata,
            crs=g.crs,
        )
    return regrid_nearest(ts, new_spec, **kw)


# ---------------------------------------------------------------------------
# Set-style utilities over the tiles table (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


def dedup_exact(ts: TileSet) -> TileSet:
    """Exact tile dedup by content key: keep the lexicographically-first
    ``image_id`` per ``phash`` (deterministic under any task order).

    Winners are found with a vectorized ``groupby(phash).aggregate(Min)``
    — NOT a ``map_groups`` UDF, which Ray invokes once per key (one Python
    call per distinct phash ≈ per tile at corpus scale) — then the winning
    rows are kept by the existing semi-join machinery (broadcast ``is_in``
    under the key budget, hash-partitioned tagged-union groupby above)."""
    from ray.data.aggregate import Min

    winners = (
        ts.ds.groupby("phash")
        .aggregate(Min("image_id", alias_name="image_id"))
        .materialize()  # O(distinct phash) rows; read twice by the semi-join
    )
    return _semi_anti_tiles(ts, TileSet(ds=winners, grid=ts.grid), anti=False)


def top_k_tiles(ts: TileSet, k: int, stat: str = "max"):
    """Top-k tiles by a per-tile NaN-ignoring statistic: per-tile partials
    AND a per-batch partial top-k in ``map_batches`` (at most k rows leave
    each task), then one tiny single-block merge — no global sort: a
    ``sort().limit(k)`` would range-shuffle every row for a k-row answer
    (the ``brute_force_topk`` pattern, round-2 verdict item 7). Ties break
    on image_id asc, matching the SQL ``ORDER BY stat DESC, image_id``.
    Returns a Ray Dataset (image_id, stat)."""
    grid = ts.grid
    descending = stat != "min"

    def _prune(ids: np.ndarray, vals: np.ndarray) -> pa.Table:
        # sort unconditionally (not only when pruning) so the final merge
        # returns rows in (stat desc, image_id) order even when the merged
        # candidate set has ≤ k rows — input is at most k·n_blocks rows
        key = -vals if descending else vals
        top = np.lexsort((ids, key))[:k]
        ids, vals = ids[top], vals[top]
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "stat": pa.array(vals, pa.float64())})

    def per_batch(batch: pa.Table) -> pa.Table:
        ids, vals = [], []
        for info, arr in iter_tiles(batch, grid):
            v = arr[np.isfinite(arr)]
            if v.size == 0:
                continue
            ids.append(info.image_id)
            if stat == "max":
                vals.append(float(v.max()))
            elif stat == "min":
                vals.append(float(v.min()))
            elif stat == "mean":
                vals.append(float(v.mean()))
            else:
                raise ValueError(f"unknown stat {stat!r}")
        return _prune(np.asarray(ids, dtype=object), np.asarray(vals, np.float64))

    def merge(batch: pa.Table) -> pa.Table:
        return _prune(
            np.asarray(batch["image_id"].to_pylist(), dtype=object),
            batch["stat"].to_numpy(zero_copy_only=False).astype(np.float64),
        )

    cand = ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
    # ≤ k rows per upstream block: one block, one merge call
    return cand.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


# key sets above this row count go through the hash-partitioned groupby
# semi/anti join instead of a broadcast value set
BROADCAST_KEY_BUDGET = 2_000_000


def _key_array_ref(other: TileSet):
    """Collect the other side's DISTINCT image_id keys as one Arrow array
    (keys only — megabytes per hundred million tiles) and broadcast once."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray

    chunks = []
    for b in other.ds.select_columns(["image_id"]).iter_batches(
        batch_format="pyarrow"
    ):
        chunks.append(b["image_id"].combine_chunks())
    keys = pc.unique(pa.concat_arrays(chunks)) if chunks else pa.array([], pa.string())
    return _ray.put(keys)


def _semi_anti_tiles(a: TileSet, b: TileSet, anti: bool) -> TileSet:
    """Semi (anti=False) / anti (anti=True) join of ``a`` against ``b``'s
    image_id keys. Fast path: broadcast key set + vectorized ``pc.is_in``.
    Above ``BROADCAST_KEY_BUDGET`` keys: hash-partitioned tagged-union
    groupby on image_id (the dedup_exact shuffle pattern) — no driver or
    per-task key materialization."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray

    if b.ds.count() <= BROADCAST_KEY_BUDGET:
        ref = _key_array_ref(b)

        def flt(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch["image_id"], value_set=_ray.get(ref))
            if anti:
                mask = pc.invert(mask)
            return batch.filter(mask)

        return TileSet(
            ds=a.ds.map_batches(flt, batch_format="pyarrow", batch_size=None),
            grid=a.grid,
        )

    # large-key fallback: tag rows, shuffle by image_id, resolve per group
    sch = a.ds.schema()
    names = list(sch.names)
    types = {n: t for n, t in zip(sch.names, sch.types)}

    def tag_a(t: pa.Table) -> pa.Table:
        return t.append_column("__tag", pa.array([0] * t.num_rows, pa.int8()))

    def tag_b(t: pa.Table) -> pa.Table:
        cols = {}
        for n in names:
            if n == "image_id":
                cols[n] = t["image_id"].combine_chunks().cast(types[n])
            else:
                cols[n] = pa.nulls(t.num_rows, types[n])
        cols["__tag"] = pa.array([1] * t.num_rows, pa.int8())
        return pa.table(cols)

    import pandas as pd

    def pick(df: "pd.DataFrame") -> "pd.DataFrame":
        present = bool((df["__tag"] == 1).any())
        keep = df[df["__tag"] == 0]
        if present == anti:
            keep = keep.iloc[0:0]
        return keep.drop(columns=["__tag"])

    tagged = a.ds.map_batches(tag_a, batch_format="pyarrow").union(
        b.ds.select_columns(["image_id"]).map_batches(tag_b, batch_format="pyarrow")
    )
    out = tagged.groupby("image_id").map_groups(pick, batch_format="pandas")
    return TileSet(ds=out, grid=a.grid)


def intersect_tiles(a: TileSet, b: TileSet) -> TileSet:
    """Tiles of ``a`` whose image_id also appears in ``b`` (semi join —
    SURVEY.md §2.8)."""
    return _semi_anti_tiles(a, b, anti=False)


def except_tiles(a: TileSet, b: TileSet) -> TileSet:
    """Tiles of ``a`` NOT present in ``b`` (anti join)."""
    return _semi_anti_tiles(a, b, anti=True)


def sample_tiles(ts: TileSet, m: int = 10, k: int = 0) -> TileSet:
    """Deterministic 1-in-m sampling by content-stable hash of image_id
    (SURVEY.md §2.8): keep tiles with ``md5(image_id)[:8 hex] % m == k``.
    Same selection on every run, any cluster size, and reproducible in SQL
    (``('0x' || substr(md5(image_id), 1, 8))::BIGINT % m``). The digest is
    computed by the batch-vectorized numpy MD5 (``hashvec.md5_prefix32``)
    — no per-row Python/hashlib loop in the hot path."""
    import pyarrow as pa

    from ..hashvec import md5_prefix32

    def flt(batch: pa.Table) -> pa.Table:
        sel = (md5_prefix32(batch["image_id"]) % np.uint64(m)) == np.uint64(k)
        return batch.filter(pa.array(sel))

    return TileSet(
        ds=ts.ds.map_batches(flt, batch_format="pyarrow", batch_size=None),
        grid=ts.grid,
    )


# byte-popcount lookup for the 64-bit Hamming verify (numpy<2 has no
# bitwise_count; LUT-gather over the 8 bytes is one vectorized pass)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def _hamming64(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Per-row popcount(x XOR y) of two int64 arrays."""
    z = (x.astype(np.uint64) ^ y.astype(np.uint64)).view(np.uint8)
    return _POP8[z].reshape(-1, 8).sum(axis=1).astype(np.int64)


def _id64(ids) -> np.ndarray:
    """Deterministic 64-bit node id per image_id string (blake2b-8; the
    engine-wide convention for string keys in int64 machinery).

    Collision bound: birthday over 63 bits — ~n²/2⁶⁴ expected colliding
    pairs, i.e. negligible below ~10⁸ DISTINCT near-dup-candidate ids but
    effectively certain at the full 10¹² corpus; a collision silently
    merges two unrelated CC groups. The near-dup pipeline only hashes ids
    that survive banding (candidates, not the corpus), which keeps real
    workloads far under the bound; past that, widen the CC keyspace to
    two int64 columns (blake2b-16 split) — the cc primitive is keyed, not
    arithmetic, so the swap is mechanical."""
    import hashlib as _hl

    return np.fromiter(
        (
            int.from_bytes(_hl.blake2b(s.encode(), digest_size=8).digest(),
                           "little") >> 1  # non-negative int64
            for s in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )


def phash_near_dups(
    ds: "ray.data.Dataset", t: int = 3, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """Image NEAR-duplicate groups by perceptual-hash Hamming distance —
    the image-side complement of the text MinHash pipeline, over the
    ``input_hint`` schema's ``phash`` column only (payloads never move).

    Banded LSH with an EXACTNESS guarantee: the 64-bit phash splits into
    4 disjoint 16-bit bands, and by pigeonhole any pair within ``t ≤ 3``
    bit flips agrees exactly on ≥ 1 band — so candidate recall is 1, not
    probabilistic. Shape (the ``minhash_near_dups`` contract):

    - band keys via vectorized shifts; per-bucket STAR edges found with
      ``groupby(key).aggregate(Min)`` + a hash join back (never a per-key
      UDF — one Python call per distinct key kills corpus-scale runs);
    - verify = vectorized 64-bit popcount ≤ t (XOR + byte-LUT gather);
    - groups via the shared distributed CC primitive on blake2b-8 node
      ids; ``group_id`` = the component's MIN image_id (string order,
      hash-independent — the witness mirrors this without knowing node
      ids).

    Star-edge semantics (witness-pinned, as in ``emb_near_dups``): members
    link through their bucket's min id when that PAIR verifies; a pair
    farther than ``t`` from the bucket min joins only through another
    shared bucket. Returns (image_id, group_id), members of groups ≥ 2.
    """
    import ray
    from ray.data.aggregate import Min as _Min

    from .cc import auto_join_partitions, coerce_schema, connected_components

    if t > 3:
        raise ValueError("t must be ≤ 3: 4 disjoint 16-bit bands only "
                         "pigeonhole up to 3 flips")
    if num_partitions is None:
        num_partitions = auto_join_partitions()

    def band_rows(batch: pa.Table) -> pa.Table:
        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["image_id"].to_pylist()
        u = ph.astype(np.uint64)
        keys = [
            ((np.uint64(b) << np.uint64(48))
             | ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF))).astype(np.int64)
            for b in range(4)
        ]
        n = len(ids)
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "image_id": pa.array(ids * 4, pa.string()),
                "phash": pa.array(np.tile(ph, 4), pa.int64()),
            }
        )

    rows = ds.map_batches(band_rows, batch_format="pyarrow", batch_size=None)
    mins = rows.groupby("key").aggregate(_Min("image_id", alias_name="rep"))
    cand = rows.join(mins, "inner", num_partitions, on=("key",))

    # representative phashes: thin (rep, rep_phash) side for the verify join
    def rep_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rep_id": batch["image_id"],
                "rep_phash": batch["phash"],
            }
        )

    reps = ds.map_batches(rep_side, batch_format="pyarrow", batch_size=None)
    cand2 = cand.join(
        reps, "inner", num_partitions, on=("rep",), right_on=("rep_id",)
    )

    def verify(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        rep = batch["rep"].to_pylist()
        keep = np.array([i != r for i, r in zip(ids, rep)], dtype=bool)
        if keep.any():
            d = _hamming64(
                batch["phash"].to_numpy(zero_copy_only=False)[keep],
                batch["rep_phash"].to_numpy(zero_copy_only=False)[keep],
            )
            keep[np.flatnonzero(keep)[d > t]] = False
        a_ids = [i for i, k in zip(ids, keep) if k]
        b_ids = [r for r, k in zip(rep, keep) if k]
        return pa.table(
            {
                "a": pa.array(_id64(a_ids), pa.int64()),
                "b": pa.array(_id64(b_ids), pa.int64()),
                "a_img": pa.array(a_ids, pa.string()),
                "b_img": pa.array(b_ids, pa.string()),
            }
        )

    edges = cand2.map_batches(verify, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        # no verified near-dup pair anywhere: short-circuit — the joins
        # below would feed zero-block sides into Ray's join (the
        # empty-partition abort)
        import ray.data as _rd

        return _rd.from_arrow(
            pa.schema(
                [("image_id", pa.string()), ("group_id", pa.string())]
            ).empty_table()
        )
    labels = connected_components(
        edges.select_columns(["a", "b"]), num_partitions=num_partitions
    )

    # node → image_id map from the edge endpoints (dup-scale, thin)
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            batch["a"].to_numpy(zero_copy_only=False),
                            batch["b"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                ),
                "img": pa.array(
                    batch["a_img"].to_pylist() + batch["b_img"].to_pylist(),
                    pa.string(),
                ),
            }
        )

    # node→image_id joins are keyed on NODE (high-cardinality, dense —
    # the engine-wide join rule); hash-shuffle groupby outputs are
    # coerced first (the cc.py schema-less-empty-block failure mode)
    _nm_schema = pa.schema([("node", pa.int64()), ("image_id", pa.string())])
    _lab_schema = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("image_id", pa.string())]
    )
    node_map = coerce_schema(
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Min("img", alias_name="image_id")),
        _nm_schema,
    )
    lab = coerce_schema(
        labels.join(node_map, "inner", num_partitions, on=("node",)),
        _lab_schema,
    )

    # group representative = MIN image_id within the component (string
    # order, independent of the int64 hash labels). Attached inside ONE
    # groupby(label).map_groups — NOT a label-keyed Dataset.join: label
    # is a LOW-cardinality key and Ray's join aggregator aborts on a
    # partition that receives zero blocks from one side (probed on Ray
    # 2.49; the high-cardinality joins above never hit it). Granularity:
    # one call per component, each component dup-cluster-sized — the
    # events_sessions per-group contract, not a per-row UDF.
    def attach(df: "pd.DataFrame") -> "pd.DataFrame":
        rep = df["image_id"].min()
        return df[["image_id"]].assign(group_id=rep)

    import pandas as pd  # noqa: F401 — map_groups pandas contract

    return lab.groupby("label").map_groups(attach, batch_format="pandas")


def pack_shards(ts: TileSet, shard_bytes: int = 262_144) -> "ray.data.Dataset":
    """Training-shard packing for image payloads: lay every tile out
    back-to-back in row-major tile order — NUMERIC ``(tile_row,
    tile_col)``, not lexicographic ``image_id`` (the two diverge once a
    grid exceeds the 4-digit zero padding of the ``t{r:04d}_{c:04d}``
    scheme, which ``parse_tile_id`` tolerates) — and cut the byte stream
    into fixed ``shard_bytes`` shards; per tile report its shard span —
    the image-side analog of ``pack_chunks`` (what a WebDataset-style
    shard writer needs to map corpus position back to provenance).

    Distributed ordered prefix-sum (the pack_chunks scan): bucket =
    ``tile_row`` (contiguous in the sort order); pass A reduces per-batch
    per-bucket byte sums to one number per bucket (driver exclusive
    prefix, broadcast); pass B sorts each bucket and cumsums locally.
    Payload LENGTHS come from one vectorized ``binary_length`` and the
    payload column is dropped immediately. Columns: image_id, n_bytes,
    first_shard, last_shard, n_shards."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum as _Sum

    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch["image_id"],
                "tile_row": batch["tile_row"],
                "tile_col": batch["tile_col"],
                "nb": pc.cast(pc.binary_length(batch["bytes"]), pa.int64()),
            }
        )

    # materialized: meta is consumed TWICE (bucket totals, then the scan)
    # and re-executing the lazy lineage would re-read the fat payload
    # column from storage; the pinned table is 3 thin columns
    meta = ts.ds.map_batches(
        lengths, batch_format="pyarrow", batch_size=None
    ).materialize()

    def bucket_partial(t: pa.Table) -> pa.Table:
        tr = t["tile_row"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(tr, return_inverse=True)
        return pa.table(
            {
                "tile_row": pa.array(uniq, pa.int64()),
                "tot": pa.array(np.bincount(inv, weights=nb).astype(np.int64),
                                pa.int64()),
            }
        )

    totals = (
        meta.map_batches(bucket_partial, batch_format="pyarrow",
                         batch_size=None)
        .groupby("tile_row")
        .aggregate(_Sum("tot", alias_name="tot"))
        .to_pandas()  # ≤ n_tile_rows rows
        .sort_values("tile_row")
    )
    trs = totals["tile_row"].to_numpy(np.int64)
    offs = np.r_[
        np.zeros(1, np.int64),
        np.cumsum(totals["tot"].to_numpy(np.int64))[:-1],
    ]
    oref = ray.put((trs, offs))

    def scan(df):
        import pandas as pd
        import ray as _ray

        t_arr, o_arr = _ray.get(oref)
        df = df.sort_values("tile_col")  # numeric row-major within the row
        nb = df["nb"].to_numpy(np.int64)
        off0 = int(o_arr[np.searchsorted(t_arr, int(df["tile_row"].iloc[0]))])
        start = off0 + np.r_[np.zeros(1, np.int64), np.cumsum(nb)[:-1]]
        first = start // shard_bytes
        last = (start + nb - 1) // shard_bytes
        return pd.DataFrame(
            {
                "image_id": df["image_id"].to_numpy(),
                "n_bytes": nb,
                "first_shard": first,
                "last_shard": last,
                "n_shards": last - first + 1,
            }
        )

    return meta.groupby("tile_row").map_groups(scan, batch_format="pandas")
