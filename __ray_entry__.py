"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship edit-DEM pipeline (EP1) on the sf0.001-scale
tiles fixture. ``queries()`` exposes every implemented operator/pipeline
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible one. Tile queries run over the
deterministic Lance-shaped fixture tables under /tmp/graft_fixtures/<sf>/
(generated at import so the oracle side can read them too); the oracle reads
the exploded ``pixels.parquet`` decoded-truth witness — an independent
reproduction of each operator's semantics in SQL.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import hydro_raster_ray  # noqa: E402
from ray import cloudpickle as _cp  # noqa: E402

# Ray workers don't inherit the driver's sys.path: ship the package by value
# inside pickled closures so pipelines run regardless of the driver's cwd.
_cp.register_pickle_by_value(hydro_raster_ray)

from hydro_raster_ray import fixtures  # noqa: E402
from hydro_raster_ray.runtime import tune_context  # noqa: E402

# the driver has already called ray.init: size the read-split minimum to
# the cluster (Ray's 200-block default shreds small inputs into ~20 ms
# tasks — see runtime.py)
tune_context()
from hydro_raster_ray.pipelines import relational  # noqa: E402
from hydro_raster_ray.pipelines.tile_queries import TILE_QUERIES  # noqa: E402
from hydro_raster_ray.text import ann, ops  # noqa: E402

# materialize fixtures for the smoke (sf0.001) and correctness (sf0.01)
# scales up front — the driver may run oracle SQL before the Ray query
for _tag in ("sf0.001", "sf0.01"):
    fixtures.ensure_fixture_dir(_tag)

F = os.path.join(fixtures.FIXTURE_ROOT, "sf0.01")  # driver correctness scale

# expected-value witnesses for the non-SQL-expressible ops (single-process
# scalar implementations → parquet; the oracle SQL just SELECTs them)
from hydro_raster_ray.text.witness import ensure_doc_witnesses  # noqa: E402

ensure_doc_witnesses("sf0.01", F)


def entry() -> Any:
    """Flagship EP1 pipeline at sf0.001: read tiles → rect-clip → FUSED
    landcover edit + zonal stats (one decode, one burn per tile —
    ``stats.apply_and_zonal``)."""
    from hydro_raster_ray.pipelines.tile_queries import tiles_for
    from hydro_raster_ray.stages.clip import rect_clip
    from hydro_raster_ray.stages.stats import apply_and_zonal

    sf_dir = "/root/testdata/sf0.001"
    ts, scheme = tiles_for(sf_dir)
    clipped = rect_clip(ts, fixtures.CLIP_WINDOW)
    feats = fixtures.rect_zone_features(scheme)
    return apply_and_zonal(clipped, feats, edit_attribute="adjust_val",
                           zone_attribute="id")


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}
    q.update(TILE_QUERIES)
    q["doc_exact_dedup"] = ops.exact_dedup
    q["doc_token_stats"] = ops.token_stats
    q["doc_quality_by_source"] = ops.quality_by_source
    q["doc_lang_id"] = ops.lang_id
    q["doc_jaccard_query"] = ops.jaccard_to_query
    q["doc_minhash_near_dups"] = ops.minhash_near_dups
    q["doc_simhash"] = ops.simhash_docs
    q["doc_fingerprint"] = ops.fingerprint_docs
    q["doc_ngram_dedup"] = ops.ngram_dup_stats
    q["doc_pii_scrub"] = ops.pii_scrub
    q["doc_repetition"] = ops.repetition_stats
    q["doc_stratified_sample"] = ops.stratified_sample
    q["doc_pack_chunks"] = ops.pack_chunks
    q["doc_rarity"] = ops.rarity_scores
    q["doc_lm_surprisal"] = ops.lm_surprisal_scores
    q["doc_dedup_filter"] = ops.dedup_filter
    q["doc_decontaminate"] = ops.decontaminate
    q["doc_lang_confusion"] = ops.lang_confusion
    q["doc_token_cms"] = ops.token_cms
    q["doc_cooccurrence"] = ops.cooccurrence_topk
    q["doc_len_quantiles"] = ops.len_quantiles_by_lang
    q["doc_heavy_hitters"] = ops.heavy_hitters
    q["doc_tfidf_top_terms"] = ops.tfidf_top_terms
    q["doc_bm25_topk"] = ops.bm25_topk
    q["ann_topk"] = ann.brute_force_topk
    q["ann_ivf_assign"] = ann.ivf_assign
    q["ann_ivf_topk"] = ann.ivf_topk
    q["ann_ivf_train"] = ann.ivf_train
    q["ann_ivf_topk_p2"] = lambda sf: ann.ivf_topk(sf, nprobe=2)
    q["emb_near_dups"] = ann.emb_near_dups
    q["emb_quantize"] = ann.emb_quantize
    q["emb_pq"] = ann.emb_pq
    q["ann_ivfpq_topk"] = ann.ivfpq_topk
    q["cluster_doc_stats"] = ann.cluster_doc_stats
    q["emb_semdedup"] = ann.semdedup
    q["ann_lsh_topk"] = ann.lsh_topk
    q["emb_jl_project"] = ann.jl_project
    q["emb_hard_negatives"] = ann.hard_negatives
    q["ann_ivf_recall"] = ann.ivf_recall
    q["events_hourly"] = relational.events_hourly
    q["events_sliding"] = relational.events_sliding
    q["events_sessions"] = relational.events_sessions
    q["events_funnel"] = relational.events_funnel
    q["events_error_asof"] = relational.events_error_asof
    q["events_error_range_join"] = relational.events_error_range_join
    q["order_priority_revenue"] = relational.order_priority_revenue
    q["returned_item_revenue"] = relational.returned_item_revenue
    q["pricing_summary"] = relational.pricing_summary
    q["revenue_by_brand"] = relational.revenue_by_brand
    q["segment_orders"] = relational.segment_orders
    q["orders_running_total"] = relational.orders_running_total
    q["events_top_users"] = relational.events_top_users_per_type
    q["events_hll"] = relational.events_hll
    q["events_retention"] = relational.events_retention
    q["large_order_customers"] = relational.large_order_customers
    q["local_supplier_revenue"] = relational.local_supplier_revenue
    q["top_unshipped_orders"] = relational.top_unshipped_orders
    q["brand_supplier_counts"] = relational.brand_supplier_counts
    q["nation_trade_volume"] = relational.nation_trade_volume
    q["promo_revenue"] = relational.promo_revenue
    q["bracket_revenue"] = relational.bracket_revenue
    q["dormant_customer_balance"] = relational.dormant_customer_balance
    q["events_zscore_outliers"] = relational.events_zscore_outliers
    q["events_rfm"] = relational.events_rfm
    q["events_path_trigrams"] = relational.events_path_trigrams
    q["events_gap_quantiles"] = relational.events_gap_quantiles
    q["doc_domain_mix"] = relational.domain_mix_weights
    q["events_mad_outliers"] = relational.events_mad_outliers
    q["customer_revenue_gini"] = relational.customer_revenue_gini
    q["events_markov"] = relational.events_markov_transitions
    q["monthly_revenue_share"] = relational.monthly_revenue_share
    q["customer_order_distribution"] = relational.customer_order_distribution
    q["top_supplier_revenue"] = relational.top_supplier_revenue
    q["small_quantity_revenue"] = relational.small_quantity_revenue
    q["market_share_by_year"] = relational.market_share_by_year
    q["shipping_lag_distribution"] = relational.shipping_lag_distribution
    q["late_supplier_count"] = relational.late_supplier_count
    q["forecast_revenue"] = relational.forecast_revenue
    q["priority_late_orders"] = relational.priority_late_orders
    q["nation_profit"] = relational.nation_profit
    q["events_cumulative_distinct"] = relational.events_cumulative_distinct
    q["doc_url_domains"] = ops.url_domains
    q["min_cost_supplier"] = relational.min_cost_supplier
    q["important_part_value"] = relational.important_part_value
    q["dominant_part_suppliers"] = relational.dominant_part_suppliers
    return q


# ---------------------------------------------------------------------------
# DuckDB oracles. Tile grid constants for the sf0.01 fixture (8x8 tiles,
# ragged): nrows=472, ncols=488, xll=340000, yll=554000, cs=5, ytop=556360.
# CLIP_WINDOW=(340261, 341028, 554168, 554882) is interior, so the reference
# clamp is a no-op and the centre-snap reduces to the round() arithmetic
# below (never half-cell, so np.round and SQL round agree).
# ---------------------------------------------------------------------------

_PX = f"read_parquet('{F}/pixels.parquet')"
_TI = f"read_parquet('{F}/tiles.parquet')"
_TD = f"read_parquet('{F}/tiles_dup.parquet')"
_GA = f"read_parquet('{F}/gauges.parquet')"
_ZO = f"read_parquet('{F}/zones.parquet')"
_M = [f"read_parquet('{F}/mosaic{i}_pixels.parquet')" for i in range(3)]

_STOP_SQL = "['" + "','".join(ops.STOPWORDS) + "']"


def _dist_sweep_sql(prev: str, cur: str) -> str:
    """One min-plus sweep CTE for the ``dist_transform_hist`` oracle:
    d'(c) = min over the 3×3 window of d(n) + [n != c]. The shifted keys
    are projected before the join (hash join, not nested loop)."""
    return f"""
 {cur} AS (
  SELECT s.gr, s.gc,
         min(CASE WHEN s.dr = 0 AND s.dc = 0 THEN b.d ELSE b.d + 1 END) d
  FROM (SELECT a.gr, a.gc, o.dr, o.dc,
               a.gr + o.dr AS ngr, a.gc + o.dc AS ngc
        FROM {prev} a CROSS JOIN offs o) s
  JOIN {prev} b ON b.gr = s.ngr AND b.gc = s.ngc
  GROUP BY s.gr, s.gc)"""


def _blur_pass_sql(src: str, dst: str) -> str:
    """One 3×3 binomial-blur pass CTE pair for the ``gauss_blur_stats``
    oracle. Pivots the nine window values with per-offset max(CASE) (≤1
    row per offset — order-free), then evaluates the IDENTICAL fixed
    left-associative weighted expression the engine kernel uses
    (``stages/blur.py`` exactness contract) and CASTs to FLOAT — the f32
    tile storage between passes. Strict window: NULL unless all 9 window
    cells are present. Shifted keys are projected before the join (hash
    join, not nested loop — the dist_transform lesson)."""
    piv = {
        (dr, dc): (
            f"max(CASE WHEN s.dr = {dr} AND s.dc = {dc} "
            f"THEN CAST(b.z AS DOUBLE) END)"
        )
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    }
    w = {(-1, -1): 1, (-1, 0): 2, (-1, 1): 1, (0, -1): 2, (0, 0): 4,
         (0, 1): 2, (1, -1): 1, (1, 0): 2, (1, 1): 1}
    expr = f"1 * {piv[(-1, -1)]}"
    for k in [(-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0),
              (1, 1)]:
        expr = f"({expr} + {w[k]} * {piv[k]})"
    return f"""
 {dst} AS (
  SELECT s.tile_id, s.gr, s.gc,
         CASE WHEN count(b.z) = 9
              THEN CAST({expr} / 16 AS FLOAT) END z
  FROM (SELECT a.tile_id, a.gr, a.gc, o.dr, o.dc,
               a.gr + o.dr AS ngr, a.gc + o.dc AS ngc
        FROM {src} a CROSS JOIN offs o) s
  LEFT JOIN {src} b ON b.gr = s.ngr AND b.gc = s.ngc AND b.z IS NOT NULL
  GROUP BY s.tile_id, s.gr, s.gc)"""


def _sobel_sql() -> str:
    """The ``sobel_stats`` oracle's 3×3 pass: pivot the nine window
    values per cell (the ``_blur_pass_sql`` recipe), evaluate the
    IDENTICAL fixed left-associative gx/gy expressions the engine kernel
    uses (``stages/sobel.py`` exactness contract), magnitude =
    ``sqrt(gx*gx + gy*gy)`` CAST to FLOAT (f32 tile storage). Strict
    window: NULL unless all 9 cells are present."""
    piv = {
        (dr, dc): (
            f"max(CASE WHEN s.dr = {dr} AND s.dc = {dc} "
            f"THEN CAST(b.z AS DOUBLE) END)"
        )
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    }
    gx_terms = [(-1, -1, -1), (-1, 1, 1), (0, -1, -2), (0, 1, 2),
                (1, -1, -1), (1, 1, 1)]
    gy_terms = [(-1, -1, -1), (-1, 0, -2), (-1, 1, -1), (1, -1, 1),
                (1, 0, 2), (1, 1, 1)]

    def chain(terms):
        dr, dc, w = terms[0]
        expr = f"({w} * {piv[(dr, dc)]})"
        for dr, dc, w in terms[1:]:
            expr = f"({expr} + ({w} * {piv[(dr, dc)]}))"
        return expr

    gx, gy = chain(gx_terms), chain(gy_terms)
    return f"""
 sb AS (
  SELECT s.tile_id, s.gr, s.gc,
         CASE WHEN count(b.z) = 9
              THEN CAST(sqrt({gx} * {gx} + {gy} * {gy}) AS FLOAT) END z
  FROM (SELECT a.tile_id, a.gr, a.gc, o.dr, o.dc,
               a.gr + o.dr AS ngr, a.gc + o.dc AS ngc
        FROM px a CROSS JOIN offs o) s
  LEFT JOIN px b ON b.gr = s.ngr AND b.gc = s.ngc AND b.z IS NOT NULL
  GROUP BY s.tile_id, s.gr, s.gc)"""


def _ncc_sql() -> str:
    """The ``ncc_stats`` oracle's 3×3 pass: pivot the nine window values
    per cell, then evaluate the IDENTICAL fixed left-associative
    mean/num/den/sqrt chain the engine kernel uses (``stages/ncc.py``
    exactness contract) in plain-column CTE layers. Strict window: NULL
    unless all 9 cells are present and the window is not exactly flat."""
    cols = {}
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            cols[(dr, dc)] = f"w{dr + 1}{dc + 1}"
    piv = ",\n         ".join(
        f"max(CASE WHEN s.dr = {dr} AND s.dc = {dc} "
        f"THEN CAST(b.z AS DOUBLE) END) {cols[(dr, dc)]}"
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    )
    order = [cols[(dr, dc)] for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    sw = order[0]
    for c in order[1:]:
        sw = f"({sw} + {c})"
    tmpl = [2, -1, -1, -1, 2, -1, -1, -1, 2]
    num = f"({tmpl[0]} * d{order[0]})"
    den = f"(d{order[0]} * d{order[0]})"
    for c, w in zip(order[1:], tmpl[1:]):
        num = f"({num} + ({w} * d{c}))"
        den = f"({den} + (d{c} * d{c}))"
    dcols = ",\n         ".join(f"({c} - mw) d{c}" for c in order)
    return f"""
 n0 AS (
  SELECT s.tile_id, s.gr, s.gc, count(b.z) nf,
         {piv}
  FROM (SELECT a.tile_id, a.gr, a.gc, o.dr, o.dc,
               a.gr + o.dr AS ngr, a.gc + o.dc AS ngc
        FROM px a CROSS JOIN offs o) s
  LEFT JOIN px b ON b.gr = s.ngr AND b.gc = s.ngc AND b.z IS NOT NULL
  GROUP BY s.tile_id, s.gr, s.gc),
 n1 AS (
  SELECT tile_id, gr, gc, nf, {sw} / 9.0 mw,
         {", ".join(order)}
  FROM n0),
 n2 AS (
  SELECT tile_id, gr, gc, nf,
         {dcols}
  FROM n1),
 n3 AS (
  SELECT tile_id, gr, gc, nf, {num} num, {den} den
  FROM n2),
 nc AS (
  SELECT tile_id, gr, gc,
         CASE WHEN nf = 9 AND den > 0
              THEN CAST(num / sqrt(den * 18.0) AS FLOAT) END z
  FROM n3)"""


def _lang_sql() -> str:
    hits = []
    for code, words in ops.LANG_MARKERS.items():
        lst = "['" + "','".join(sorted(words)) + "']"
        hits.append(
            f"len(list_filter(toks, x -> list_contains({lst}, x))) AS {code}"
        )
    langs = list(ops.LANG_MARKERS)
    cases = []
    for code in langs:
        others = " AND ".join(
            f"{code} > {o}" for o in langs if o != code
        )
        cases.append(f"WHEN {others} AND {code} > 0 THEN '{code}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
WITH t AS (SELECT doc_id, lang,
        list_transform(regexp_extract_all(text, '\\S+'), x -> lower(x)) toks
      FROM documents),
 h AS (SELECT doc_id, lang, {', '.join(hits)} FROM t)
SELECT doc_id, {case_sql} AS pred_lang, lang FROM h
"""


def oracle_sql() -> dict[str, str]:
    return {
        # ---- tile engine ----
        "tile_fmt_summary": f"""
SELECT t.fmt, CAST(count(DISTINCT t.image_id) AS BIGINT) n_tiles,
       CAST(count(*) AS BIGINT) n_px, CAST(count(p.z) AS BIGINT) n_valid
FROM {_TI} t JOIN {_PX} p ON p.tile_id = t.image_id GROUP BY t.fmt
""",
        # histogram equalization reproduced in SQL: identical double binning
        # expression, then pure-integer cdf→remap (see stats.py contract)
        "hist_equalize_stats": f"""
WITH p AS (SELECT tile_id, z FROM {_PX} WHERE z IS NOT NULL),
 mm AS (SELECT min(z) zmin, max(z) zmax FROM p),
 b AS (SELECT tile_id,
              LEAST(CAST(floor((z - zmin) / (zmax - zmin) * 256) AS BIGINT),
                    255) bin
       FROM p, mm),
 h AS (SELECT bin, count(*) cnt FROM b GROUP BY bin),
 c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) cdf FROM h),
 k AS (SELECT min(cdf) cdfmin, (SELECT count(*) FROM p) n FROM c),
 m AS (SELECT bin, (cdf - cdfmin) * 255 // (n - cdfmin) eq FROM c, k)
SELECT b.tile_id image_id, CAST(count(*) AS BIGINT) n_valid,
       CAST(sum(m.eq) AS BIGINT) sum_eq,
       CAST(min(m.eq) AS BIGINT) min_eq, CAST(max(m.eq) AS BIGINT) max_eq
FROM b JOIN m USING (bin) GROUP BY b.tile_id ORDER BY image_id
""",
        # gaps-and-islands: a run breaks at a NaN gap or flag flip because
        # gc advances strictly more than the within-flag rank (see
        # stages/stats.rle_stats for the equivalence argument)
        "rle_stats": f"""
WITH p AS (SELECT tile_id, gr, gc, z FROM {_PX} WHERE z IS NOT NULL),
 mm AS (SELECT (min(z) + max(z)) / 2 thr FROM p),
 f AS (SELECT tile_id, gr, gc, (z >= thr) fl FROM p, mm),
 i AS (SELECT tile_id, gr, fl,
              gc - row_number() OVER
                  (PARTITION BY tile_id, gr, fl ORDER BY gc) isl
       FROM f),
 runs AS (SELECT tile_id, CAST(count(*) AS BIGINT) run_len
          FROM i GROUP BY tile_id, gr, fl, isl)
SELECT tile_id image_id,
       CAST(sum(run_len) AS BIGINT) n_valid,
       CAST(count(*) AS BIGINT) n_runs,
       CAST(max(run_len) AS BIGINT) max_run
FROM runs GROUP BY tile_id ORDER BY image_id
""",
        # identical-double haversine both sides; first-min tie-break ==
        # ORDER BY d, nn_id (see pipelines/tile_queries.q_haversine_nn)
        "haversine_nn": f"""
WITH g AS (SELECT gauge_id,
                  (y - 556000.0) / 5000.0 lat,
                  (x - 340000.0) / 3000.0 lon
           FROM {_GA}),
 d AS (SELECT a.gauge_id, b.gauge_id nn_id,
              2 * 6371.0 * asin(sqrt(
                  pow(sin((b.lat - a.lat) * pi() / 180 / 2), 2)
                  + cos(a.lat * pi() / 180) * cos(b.lat * pi() / 180)
                  * pow(sin((b.lon - a.lon) * pi() / 180 / 2), 2))) d
       FROM g a JOIN g b ON a.gauge_id <> b.gauge_id),
 r AS (SELECT *, row_number() OVER
           (PARTITION BY gauge_id ORDER BY d, nn_id) rk FROM d)
SELECT gauge_id, nn_id, round(d, 6) dist_km
FROM r WHERE rk = 1 ORDER BY gauge_id
""",
        # Otsu 1979, reproduced INDEPENDENTLY in SQL: identical binning
        # expression, HUGEINT cumulative windows, the same one-rounding
        # double score, argmax tie-break ORDER BY score DESC, bin ASC
        "otsu_threshold_stats": f"""
WITH p AS (SELECT tile_id, z FROM {_PX} WHERE z IS NOT NULL),
 mm AS (SELECT min(z) zmin, max(z) zmax FROM p),
 b AS (SELECT tile_id,
              LEAST(CAST(floor((z - zmin) / (zmax - zmin) * 256) AS BIGINT),
                    255) bin
       FROM p, mm),
 h AS (SELECT bin, count(*) cnt FROM b GROUP BY bin),
 tot AS (SELECT count(*) n, sum(bin) t1 FROM b),
 c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) c0,
              sum(bin * cnt) OVER (ORDER BY bin) c1
       FROM h),
 sc AS (SELECT bin,
               CAST((c1 * n - t1 * c0) * (c1 * n - t1 * c0) AS DOUBLE)
                   / CAST(c0 * (n - c0) AS DOUBLE) score
        FROM c, tot WHERE c0 > 0 AND c0 < n),
 th AS (SELECT bin thresh FROM sc ORDER BY score DESC, bin LIMIT 1)
SELECT b.tile_id image_id, th.thresh,
       CAST(sum(CASE WHEN bin > thresh THEN 1 ELSE 0 END) AS BIGINT) n_fg,
       CAST(sum(CASE WHEN bin > thresh THEN 0 ELSE 1 END) AS BIGINT) n_bg,
       CAST(sum(CASE WHEN bin > thresh THEN bin ELSE 0 END)
            AS BIGINT) sum_bin_fg,
       CAST(sum(CASE WHEN bin > thresh THEN 0 ELSE bin END)
            AS BIGINT) sum_bin_bg
FROM b, th GROUP BY b.tile_id, th.thresh ORDER BY image_id
""",
        # marching squares, reproduced INDEPENDENTLY in SQL: 2×2 corner
        # windows via self-join, crossing flags, the identical double
        # crossing-parameter expression, the fixed saddle pairing
        # (top,right)+(bottom,left), cell-local point coordinates (see
        # stages/contour.py for the shared geometry contract)
        "contour_stats": f"""
WITH px AS (SELECT gr, gc, z FROM {_PX} WHERE z IS NOT NULL),
 cell AS (
   SELECT a.z z00, b.z z01, c.z z10, d.z z11
   FROM px a
   JOIN px b ON b.gr = a.gr AND b.gc = a.gc + 1
   JOIN px c ON c.gr = a.gr + 1 AND c.gc = a.gc
   JOIN px d ON d.gr = a.gr + 1 AND d.gc = a.gc + 1),
 lv AS (SELECT unnest([CAST(-50 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(50 AS DOUBLE)]) L),
 fl AS (
   SELECT L, z00, z01, z10, z11,
          (z00 >= L) <> (z01 >= L) ct,
          (z01 >= L) <> (z11 >= L) cr,
          (z10 >= L) <> (z11 >= L) cb,
          (z00 >= L) <> (z10 >= L) cl
   FROM cell, lv),
 y AS (
   SELECT L, ct, cr, cb, cl,
          CAST(ct AS INT) + CAST(cr AS INT) + CAST(cb AS INT)
              + CAST(cl AS INT) n,
          CASE WHEN ct THEN (L - z00) / (z01 - z00) END tt,
          CASE WHEN cr THEN (L - z01) / (z11 - z01) END tr,
          CASE WHEN cb THEN (L - z10) / (z11 - z10) END tb,
          CASE WHEN cl THEN (L - z00) / (z10 - z00) END tl
   FROM fl),
 seg AS (
   SELECT L, n,
     CASE WHEN n = 4
          THEN sqrt((tt - 1) * (tt - 1) + (0 - tr) * (0 - tr))
               + sqrt((tb - 0) * (tb - 0) + (1 - tl) * (1 - tl))
          WHEN ct AND cr THEN sqrt((tt - 1) * (tt - 1) + (0 - tr) * (0 - tr))
          WHEN ct AND cb THEN sqrt((tt - tb) * (tt - tb) + (0 - 1) * (0 - 1))
          WHEN ct AND cl THEN sqrt((tt - 0) * (tt - 0) + (0 - tl) * (0 - tl))
          WHEN cr AND cb THEN sqrt((1 - tb) * (1 - tb) + (tr - 1) * (tr - 1))
          WHEN cr AND cl THEN sqrt((1 - 0) * (1 - 0) + (tr - tl) * (tr - tl))
          WHEN cb AND cl THEN sqrt((tb - 0) * (tb - 0) + (1 - tl) * (1 - tl))
     END d
   FROM y WHERE n > 0)
SELECT L AS "level", CAST(count(*) AS BIGINT) n_cells,
       CAST(sum(n // 2) AS BIGINT) n_segments,
       CAST(round(sum(5.0 * d), 3) AS DOUBLE) total_len
FROM seg GROUP BY L ORDER BY L
""",
        "grid_global_stats": f"""
SELECT CAST(count(*) AS BIGINT) n_px, CAST(count(z) AS BIGINT) n_valid,
       CAST(round(sum(z), 2) AS DOUBLE) sum_z, min(z) min_z, max(z) max_z,
       CAST(round(avg(z), 6) AS DOUBLE) mean_z
FROM {_PX}
""",
        "grid_percentiles": f"""
SELECT quantile_disc(z, 0.1) p10, quantile_disc(z, 0.5) p50,
       quantile_disc(z, 0.9) p90
FROM {_PX}
""",
        "rect_clip_stats": f"""
WITH win AS (SELECT CAST(round((340261.0 - 340000.0)/5.0) AS BIGINT) c0,
                    CAST(round((341028.0 - 340000.0)/5.0 - 1) AS BIGINT) c1,
                    CAST(round((556360.0 - 554882.0)/5.0) AS BIGINT) r0,
                    CAST(round((556360.0 - 554168.0)/5.0 - 1) AS BIGINT) r1)
SELECT p.tile_id AS image_id, CAST(count(*) AS BIGINT) n_px,
       CAST(count(p.z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(p.z), 0), 2) AS DOUBLE) sum_z
FROM {_PX} p, win
WHERE p.gr BETWEEN win.r0 AND win.r1 AND p.gc BETWEEN win.c0 AND win.c1
GROUP BY p.tile_id
""",
        "zonal_stats": f"""
WITH px AS (
  SELECT p.gr, p.gc, p.z, max(zz.feature_id) f
  FROM {_PX} p JOIN {_ZO} zz
    ON p.x >= zz.xmin AND p.x <= zz.xmax AND p.y >= zz.ymin AND p.y <= zz.ymax
  WHERE p.z IS NOT NULL
  GROUP BY p.gr, p.gc, p.z)
SELECT z3.id AS zone, CAST(count(*) AS BIGINT) n,
       CAST(round(sum(px.z), 2) AS DOUBLE) sum_z,
       min(px.z) min_z, max(px.z) max_z
FROM px JOIN {_ZO} z3 ON z3.feature_id = px.f
GROUP BY z3.id
""",
        "caption_stats": f"""
SELECT CAST(regexp_extract(caption, 'cellsize=([0-9.]+)', 1) AS DOUBLE)
           AS cellsize,
       regexp_extract(caption, 'crs=(\\S+)', 1) AS crs,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN regexp_extract(caption, 'DEM tile (\\S+) ', 1)
                          = image_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_id_ok
FROM read_parquet('{F}/tiles.parquet')
GROUP BY 1, 2
""",
        "tile_pack_shards": f"""
WITH t AS (SELECT image_id, octet_length(bytes) AS nb,
        coalesce(sum(octet_length(bytes))
                   OVER (ORDER BY
                           CAST(substring(image_id, 2,
                                strpos(image_id, '_') - 2) AS BIGINT),
                           CAST(substring(image_id,
                                strpos(image_id, '_') + 1) AS BIGINT)
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cum0
      FROM read_parquet('{F}/tiles.parquet'))
SELECT image_id, CAST(nb AS BIGINT) AS n_bytes,
       CAST(cum0 // 262144 AS BIGINT) AS first_shard,
       CAST((cum0 + nb - 1) // 262144 AS BIGINT) AS last_shard,
       CAST((cum0 + nb - 1) // 262144 - cum0 // 262144 + 1
            AS BIGINT) AS n_shards
FROM t
""",
        "phash_near_dups": f"""
SELECT image_id, group_id
FROM read_parquet('{F}/witness_phash_near.parquet')
""",
                "zonal_crosstab": f"""
WITH px AS (
  SELECT p.gr, p.gc, p.z, max(zz.feature_id) f
  FROM {_PX} p JOIN {_ZO} zz
    ON p.x >= zz.xmin AND p.x <= zz.xmax AND p.y >= zz.ymin AND p.y <= zz.ymax
  WHERE p.z IS NOT NULL
  GROUP BY p.gr, p.gc, p.z),
 b AS (
  SELECT z3.id AS zone,
         (px.z >= -30.0)::INT + (px.z >= -10.0)::INT + (px.z >= 0.0)::INT
           + (px.z >= 10.0)::INT + (px.z >= 30.0)::INT AS bin
  FROM px JOIN {_ZO} z3 ON z3.feature_id = px.f)
SELECT CAST(zone AS BIGINT) AS zone, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY zone, bin
""",
"zonal_majority": f"""
WITH px AS (
  SELECT p.gr, p.gc, p.z, max(zz.feature_id) f
  FROM {_PX} p JOIN {_ZO} zz
    ON p.x >= zz.xmin AND p.x <= zz.xmax AND p.y >= zz.ymin AND p.y <= zz.ymax
  WHERE p.z IS NOT NULL
  GROUP BY p.gr, p.gc, p.z),
 b AS (
  SELECT z3.id AS zone,
         (px.z >= -30.0)::INT + (px.z >= -10.0)::INT + (px.z >= 0.0)::INT
           + (px.z >= 10.0)::INT + (px.z >= 30.0)::INT AS bin
  FROM px JOIN {_ZO} z3 ON z3.feature_id = px.f),
 c AS (SELECT zone, bin, count(*) AS n FROM b GROUP BY zone, bin),
 r AS (SELECT zone, bin, n,
              row_number() OVER (PARTITION BY zone
                                 ORDER BY n DESC, bin) AS rn,
              sum(n) OVER (PARTITION BY zone) AS n_total
       FROM c)
SELECT CAST(zone AS BIGINT) AS zone, CAST(bin AS BIGINT) AS maj_bin,
       CAST(n AS BIGINT) AS n_maj, CAST(n_total AS BIGINT) AS n_total
FROM r WHERE rn = 1
""",
        "voronoi_counts": f"""
WITH a AS (
  SELECT p.gr, p.gc, p.z,
         arg_min(g.gauge_id, (p.x-g.x)*(p.x-g.x) + (p.y-g.y)*(p.y-g.y)) gid
  FROM {_PX} p CROSS JOIN {_GA} g GROUP BY p.gr, p.gc, p.z)
SELECT gid AS gauge_id, CAST(count(*) AS BIGINT) n_cells,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM a GROUP BY gid
""",
        "idw_mean": f"""
WITH w AS (
  SELECT p.gr, p.gc,
    sum(g.value / ((p.x-g.x)*(p.x-g.x) + (p.y-g.y)*(p.y-g.y)))
      / sum(1.0 / ((p.x-g.x)*(p.x-g.x) + (p.y-g.y)*(p.y-g.y))) v
  FROM {_PX} p CROSS JOIN {_GA} g GROUP BY p.gr, p.gc)
SELECT CAST(count(*) AS BIGINT) n_cells, CAST(round(avg(v), 6) AS DOUBLE) mean_idw
FROM w
""",
        # resample to 7.5 m: nrows_new=floor(472*5/7.5)=314, ncols_new=325;
        # src row of target i = round(1.25+1.5i), src col of j = round(0.25+1.5j)
        # (same arithmetic as map2sub; never lands on .5)
        "resample_stats": f"""
WITH m AS (
  SELECT CAST(round(1.25 + 1.5*i.range) AS BIGINT) sr,
         CAST(round(0.25 + 1.5*j.range) AS BIGINT) sc
  FROM range(314) i, range(325) j)
SELECT CAST(count(*) AS BIGINT) n_px, CAST(count(p.z) AS BIGINT) n_valid,
       CAST(round(sum(p.z), 2) AS DOUBLE) sum_z, min(p.z) min_z, max(p.z) max_z
FROM m JOIN {_PX} p ON p.gr = m.sr AND p.gc = m.sc
""",
        "phash_dedup": f"""
SELECT phash, min(image_id) image_id FROM {_TD} GROUP BY phash
""",
        "sample_tiles": f"""
SELECT image_id, phash FROM {_TI}
WHERE ('0x' || substr(md5(image_id), 1, 8))::BIGINT % 3 = 0
""",
        "tile_set_ops": f"""
SELECT image_id,
       CASE WHEN ('0x' || substr(md5(image_id), 1, 8))::BIGINT % 3 = 0
            THEN 'intersect' ELSE 'except' END side
FROM {_TI}
""",
        "classify_hist": f"""
SELECT CAST((z >= -30.0)::INT + (z >= -10.0)::INT + (z >= 0.0)::INT
          + (z >= 10.0)::INT + (z >= 30.0)::INT AS BIGINT) bin,
       CAST(count(*) AS BIGINT) n
FROM {_PX} WHERE z IS NOT NULL GROUP BY 1
""",
        "tile_topk": f"""
SELECT tile_id AS image_id, max(z) stat FROM {_PX}
GROUP BY tile_id ORDER BY stat DESC, image_id LIMIT 5
""",
        "mosaic_combine_stats": f"""
WITH u AS (
  SELECT x, y, z, 0 AS rnk FROM {_M[0]}
  UNION ALL SELECT x, y, z, 1 FROM {_M[1]}
  UNION ALL SELECT x, y, z, 2 FROM {_M[2]}),
 m AS (SELECT x, y, max(rnk) mr FROM u GROUP BY x, y)
SELECT CAST(count(u.z) AS BIGINT) n_valid,
       CAST(round(sum(u.z), 2) AS DOUBLE) sum_z, min(u.z) min_z, max(u.z) max_z
FROM u JOIN m ON u.x = m.x AND u.y = m.y AND u.rnk = m.mr
""",
        "merge_stats": f"""
SELECT CAST(count(v) AS BIGINT) n_valid, CAST(round(sum(v), 2) AS DOUBLE) sum_z,
       min(v) min_z, max(v) max_z
FROM (SELECT coalesce(m2.z, m0.z) v
      FROM {_M[0]} m0 LEFT JOIN {_M[2]} m2 ON m0.x = m2.x AND m0.y = m2.y)
""",
        "mosaic_skew_stats": f"""
WITH pick AS (
  SELECT x, y, arg_max(z, li) AS z
  FROM read_parquet('{F}/skew_pixels.parquet')
  WHERE z IS NOT NULL GROUP BY x, y)
SELECT CAST(count(*) AS BIGINT) n_valid, CAST(round(sum(z), 2) AS DOUBLE) sum_z,
       min(z) min_z, max(z) max_z
FROM pick
""",
        # ---- documents / embeddings / events ----
        "doc_exact_dedup": """
SELECT md5(text) h, CAST(min(doc_id) AS BIGINT) keep_id,
       CAST(count(*) AS BIGINT) n
FROM documents GROUP BY md5(text)
""",
        "doc_token_stats": f"""
SELECT lang, CAST(count(*) AS BIGINT) n_docs,
       CAST(sum(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) n_tokens,
       CAST(sum(length(regexp_extract_all(text, '{ops.BPE_PATTERN_SQL}'))) AS BIGINT) n_bpe,
       CAST(sum(n_chars) AS BIGINT) n_chars
FROM documents GROUP BY lang
""",
        "doc_quality_by_source": f"""
WITH t AS (SELECT source, regexp_extract_all(text, '\\S+') toks FROM documents),
 q AS (SELECT source, len(toks) wc,
        len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) stop_n,
        len(list_distinct(toks)) uniq_n FROM t)
SELECT source, CAST(count(*) AS BIGINT) n,
  CAST(round(avg(0.4*least(wc/100.0, 1.0)
      + 0.3*(1.0 - stop_n::DOUBLE/greatest(wc, 1))
      + 0.3*(uniq_n::DOUBLE/greatest(wc, 1))), 4) AS DOUBLE) avg_quality
FROM q GROUP BY source
""",
        "doc_repetition": """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
           FROM documents),
 s AS (SELECT doc_id, len(toks) AS n_toks,
              len(list_distinct(toks)) AS n_dist FROM t),
 g AS (SELECT doc_id,
              unnest(list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1])) AS gram
       FROM t WHERE len(toks) > 1),
 c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
 m AS (SELECT doc_id, max(cnt) AS mx, sum(cnt) AS tot FROM c GROUP BY doc_id),
 j AS (SELECT s.doc_id, s.n_toks,
              CAST(floor(10000.0 * (1.0 - CAST(s.n_dist AS DOUBLE) / s.n_toks))
                   AS BIGINT) AS dup_tok_pm,
              CAST(coalesce(floor((10000.0 * CAST(m.mx AS DOUBLE)) / m.tot), 0)
                   AS BIGINT) AS top2_pm
       FROM s LEFT JOIN m ON s.doc_id = m.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_toks AS BIGINT) AS n_toks,
       dup_tok_pm, top2_pm,
       CAST(CASE WHEN dup_tok_pm > 7000 OR top2_pm > 2000 THEN 1 ELSE 0 END
            AS BIGINT) AS flagged
FROM j
""",
        "doc_stratified_sample": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rn
      FROM documents)
WHERE rn <= 5
""",
        "doc_pack_chunks": f"""
WITH t AS (SELECT doc_id,
        len(regexp_extract_all(text, '{ops.BPE_PATTERN_SQL}')) n_tokens
      FROM documents),
 c AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum0
       FROM t)
SELECT CAST(doc_id AS BIGINT) doc_id, CAST(n_tokens AS BIGINT) n_tokens,
       CAST(cum0 // 256 AS BIGINT) first_chunk,
       CAST((cum0 + greatest(n_tokens, 1) - 1) // 256 AS BIGINT) last_chunk,
       CAST((cum0 + greatest(n_tokens, 1) - 1) // 256 - cum0 // 256 + 1
            AS BIGINT) n_chunks
FROM c
""",
        "doc_decontaminate": f"""
SELECT doc_id, n_windows, n_hits, contaminated
FROM read_parquet('{F}/witness_decontam.parquet')
""",
        "doc_dedup_filter": f"""
WITH g AS (SELECT doc_id, group_id
           FROM read_parquet('{F}/witness_minhash_groups.parquet')),
 drops AS (SELECT doc_id FROM g WHERE doc_id != group_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d LEFT JOIN drops USING (doc_id)
WHERE drops.doc_id IS NULL
""",
        # windowed token-pair co-occurrence: positions (i, j), 0 < j-i < 3,
        # pair ordered lexicographically; exact int counts, total-order top-k
        "doc_cooccurrence": """
WITH t AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '\\S+') toks
           FROM documents),
 p AS (SELECT doc_id, unnest(toks) tok,
              generate_subscripts(toks, 1) i FROM t),
 pr AS (SELECT least(a.tok, b.tok) tok_a, greatest(a.tok, b.tok) tok_b
        FROM p a JOIN p b
          ON a.doc_id = b.doc_id AND b.i > a.i AND b.i < a.i + 3)
SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) n_pair
FROM pr GROUP BY tok_a, tok_b
ORDER BY n_pair DESC, tok_a, tok_b LIMIT 50
""",
        # grouped exact type-1 quantiles: rank = ceil(num*n/den) in INTEGER
        # arithmetic on both sides (float ceil would round differently under
        # DECIMAL vs IEEE double)
        "doc_len_quantiles": """
WITH r AS (SELECT lang, n_chars,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars) rn,
                  count(*) OVER (PARTITION BY lang) n
           FROM documents)
SELECT lang, CAST(max(n) AS BIGINT) n_docs,
       CAST(max(CASE WHEN rn = (1 * n + 3) // 4 THEN n_chars END)
            AS BIGINT) p25,
       CAST(max(CASE WHEN rn = (1 * n + 1) // 2 THEN n_chars END)
            AS BIGINT) p50,
       CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END)
            AS BIGINT) p75,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END)
            AS BIGINT) p90
FROM r GROUP BY lang
""",
        "doc_heavy_hitters": """
WITH flat AS (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) tok
              FROM documents)
SELECT tok, CAST(count(*) AS BIGINT) n
FROM flat GROUP BY tok ORDER BY n DESC, tok LIMIT 10
""",
        # integer fixed-point idf (1e6 // source-df) — the rarity_scores
        # convention; tie-break (score DESC, tok ASC) both sides
        "doc_tfidf_top_terms": """
WITH t AS (SELECT source,
                  unnest(regexp_extract_all(lower(text), '\\S+')) tok
           FROM documents),
 st AS (SELECT source, tok, CAST(count(*) AS BIGINT) tf
        FROM t GROUP BY source, tok),
 d AS (SELECT tok, CAST(count(*) AS BIGINT) df FROM st GROUP BY tok),
 sc AS (SELECT source, tok, tf,
               CAST(tf * (1000000 // df) AS BIGINT) score
        FROM st JOIN d USING (tok)),
 r AS (SELECT *, row_number() OVER
           (PARTITION BY source ORDER BY score DESC, tok) rk FROM sc)
SELECT source, CAST(rk AS BIGINT) rk, tok, tf, score
FROM r WHERE rk <= 3
""",
        # log-free fixed-point BM25 (k1=1, b=1/2 folded into an exact
        # rational; Robertson idf argument in fixed point) — see
        # text/ops.bm25_topk for the derivation
        "doc_bm25_topk": """
WITH q AS (SELECT unnest(['customer', 'merge', 'window']) qt),
 tk AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') toks
        FROM documents),
 n AS (SELECT CAST(count(*) AS BIGINT) d,
              CAST(sum(len(toks)) AS BIGINT) t FROM tk),
 f AS (SELECT doc_id, unnest(toks) tok FROM tk),
 tf AS (SELECT f.doc_id, f.tok, CAST(count(*) AS BIGINT) tf
        FROM f JOIN q ON f.tok = q.qt GROUP BY f.doc_id, f.tok),
 dfq AS (SELECT tok, CAST(count(*) AS BIGINT) df FROM tf GROUP BY tok),
 dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) dl FROM tk),
 sc AS (SELECT tf.doc_id,
               ((1000000 * (2 * (n.d - dfq.df) + 1)) // (2 * dfq.df + 1))
                   * 4 * tf.tf * n.t
                   // (2 * n.t * tf.tf + n.t + dl.dl * n.d) s
        FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), n)
SELECT CAST(doc_id AS BIGINT) doc_id,
       CAST(count(*) AS BIGINT) n_hit,
       CAST(sum(s) AS BIGINT) score
FROM sc GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20
""",
        # consecutive-event deltas under the (ts, event_id) total order;
        # exact type-1 quantiles in INTEGER rank arithmetic (the
        # doc_len_quantiles convention)
        "events_gap_quantiles": """
WITH e AS (SELECT event_type, epoch_us(ts) us, event_id FROM events),
 g AS (SELECT event_type,
              us - lag(us) OVER
                  (PARTITION BY event_type ORDER BY us, event_id) gap
       FROM e),
 v AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
 r AS (SELECT event_type, gap,
              row_number() OVER (PARTITION BY event_type ORDER BY gap) rn,
              count(*) OVER (PARTITION BY event_type) m
       FROM v)
SELECT event_type, CAST(max(m) AS BIGINT) n_gaps,
       CAST(max(CASE WHEN rn = (1 * m + 1) // 2 THEN gap END)
            AS BIGINT) p50_us,
       CAST(max(CASE WHEN rn = (9 * m + 9) // 10 THEN gap END)
            AS BIGINT) p90_us,
       CAST(max(gap) AS BIGINT) max_us
FROM r GROUP BY event_type
""",
        # deterministic ±1 JL sign matrix from pure integer arithmetic;
        # one rounded double per (vec, dim) — see text/ann.jl_project
        "emb_jl_project": """
WITH e AS (SELECT vec_id, unnest(embedding) x,
                  generate_subscripts(embedding, 1) i
           FROM embeddings),
 dims AS (SELECT unnest([0, 1, 2, 3]) j),
 s AS (SELECT i, j,
              CASE WHEN (i * 2654435761 + j * 40503) % 97 < 48
                   THEN 1.0 ELSE -1.0 END sgn
       FROM (SELECT DISTINCT i FROM e), dims)
SELECT CAST(e.vec_id AS BIGINT) vec_id, CAST(s.j AS BIGINT) dim,
       round(sum(CAST(e.x AS DOUBLE) * s.sgn) / sqrt(4.0), 6) v
FROM e JOIN s USING (i)
GROUP BY e.vec_id, s.j
""",
        # argmax over different-label cosine sims; tie-break (sim DESC,
        # neg_id) == np.argmax first-max on id-sorted columns — see
        # text/ann.hard_negatives for the float-tie caveat
        "emb_hard_negatives": """
WITH p AS (SELECT a.vec_id, b.vec_id nid,
                  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) sim
           FROM embeddings a JOIN embeddings b ON a.label <> b.label),
 r AS (SELECT vec_id, nid, sim, row_number() OVER
           (PARTITION BY vec_id ORDER BY sim DESC, nid) rk FROM p)
SELECT CAST(vec_id AS BIGINT) vec_id, CAST(nid AS BIGINT) neg_id,
       round(sim, 6) sim
FROM r WHERE rk = 1
""",
        "doc_domain_mix": """
WITH t AS (SELECT source,
                  CAST(len(regexp_extract_all(lower(text), '\\S+'))
                       AS BIGINT) nt
           FROM documents),
 s AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
              CAST(sum(nt) AS BIGINT) n_tokens
       FROM t GROUP BY source),
 g AS (SELECT CAST(sum(n_tokens) AS BIGINT) tok_total,
              CAST(sum(n_docs) AS BIGINT) doc_total FROM s)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens * 1000000 // tok_total AS BIGINT) weight_ppm,
       CAST(n_docs * 1000000 // doc_total AS BIGINT) doc_ppm
FROM s, g
""",
        # median/MAD in TYPE-1 integer rank arithmetic on exact cents;
        # outlier test in pure int64 (see relational.events_mad_outliers)
        "events_mad_outliers": """
WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) cents
           FROM events WHERE event_type = 'purchase'),
 r1 AS (SELECT user_id, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY cents) rn,
               count(*) OVER (PARTITION BY user_id) m
        FROM e),
 med AS (SELECT user_id, max(m) m,
                CAST(max(CASE WHEN rn = (1 * m + 1) // 2 THEN cents END)
                     AS BIGINT) med
         FROM r1 GROUP BY user_id),
 d AS (SELECT e.user_id, abs(e.cents - med.med) dev, med.med, med.m
       FROM e JOIN med USING (user_id)),
 r2 AS (SELECT user_id, dev, med, m,
               row_number() OVER (PARTITION BY user_id ORDER BY dev) rn
        FROM d),
 madt AS (SELECT user_id, max(m) m, max(med) med,
                 CAST(max(CASE WHEN rn = (1 * m + 1) // 2 THEN dev END)
                      AS BIGINT) mad
          FROM r2 GROUP BY user_id)
SELECT d.user_id, CAST(max(d.m) AS BIGINT) n_events,
       CAST(max(madt.med) AS BIGINT) med_cents,
       CAST(max(madt.mad) AS BIGINT) mad_cents,
       CAST(sum(CASE WHEN d.dev > 3 * madt.mad THEN 1 ELSE 0 END)
            AS BIGINT) n_outliers
FROM d JOIN madt USING (user_id) GROUP BY d.user_id
""",
        # recall@k: IVF (nprobe=1 → the query's own min-cid-tie bucket)
        # vs exact brute force, both rankings reproduced in SQL
        "ann_ivf_recall": """
WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
           WHERE vec_id IN (0, 1, 2)),
 brute AS (
   SELECT q.qid, e.vec_id
   FROM embeddings e, q WHERE e.vec_id <> q.qid
   QUALIFY row_number() OVER (PARTITION BY q.qid
       ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) DESC,
                e.vec_id) <= 10),
 c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id < 8),
 s AS (SELECT e.vec_id, c.cid,
        list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) sim
       FROM embeddings e, c),
 a AS (SELECT vec_id, min(cid) centroid
       FROM (SELECT vec_id, cid, sim,
                    max(sim) OVER (PARTITION BY vec_id) ms FROM s)
       WHERE sim = ms GROUP BY vec_id),
 qa AS (SELECT a.vec_id qid, a.centroid FROM a JOIN q ON a.vec_id = q.qid),
 ivf AS (
   SELECT q.qid, e.vec_id
   FROM embeddings e
   JOIN a ON a.vec_id = e.vec_id
   JOIN qa ON qa.centroid = a.centroid AND qa.qid <> e.vec_id
   JOIN q ON q.qid = qa.qid
   QUALIFY row_number() OVER (PARTITION BY q.qid
       ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) DESC,
                e.vec_id) <= 10)
SELECT b.qid, CAST(count(i.vec_id) AS BIGINT) n_hit,
       CAST(count(i.vec_id) * 1000000 // 10 AS BIGINT) recall_ppm
FROM brute b LEFT JOIN ivf i USING (qid, vec_id)
GROUP BY b.qid
""",
        # exact integer Gini over ranked customer revenue (1-based rank
        # ORDER BY cents, custkey — the _global_ranks contract)
        "customer_revenue_gini": """
WITH c AS (SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) cents
           FROM orders GROUP BY o_custkey),
 rk AS (SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) i FROM c),
 agg AS (SELECT count(*) n, sum(cents) s, sum(i * cents) si FROM rk)
SELECT CAST(n AS BIGINT) n_customers, CAST(s AS BIGINT) total_cents,
       CAST((2 * si - (n + 1) * s) * 1000000 // (n * s) AS BIGINT) gini_ppm
FROM agg
""",
        "events_markov": """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER
                      (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) nxt
           FROM events),
 c AS (SELECT event_type from_type, nxt to_type,
              CAST(count(*) AS BIGINT) n
       FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
 t AS (SELECT from_type, sum(n) tot FROM c GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n,
       CAST(c.n * 1000000 // t.tot AS BIGINT) p_ppm
FROM c JOIN t USING (from_type)
""",
        "monthly_revenue_share": """
WITH m AS (SELECT CAST(month(o_orderdate) AS BIGINT) "month",
                  CAST(round(o_totalprice * 100) AS BIGINT) cents
           FROM orders),
 g AS (SELECT "month", CAST(count(*) AS BIGINT) n_orders,
              CAST(sum(cents) AS BIGINT) cents
       FROM m GROUP BY "month"),
 t AS (SELECT sum(cents) tot FROM g)
SELECT "month", n_orders, cents,
       CAST(cents * 1000000 // tot AS BIGINT) share_ppm
FROM g, t
""",
        "doc_rarity": """
WITH toks AS (SELECT DISTINCT doc_id, tok
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\\S+'))
                               AS tok
                    FROM documents)),
 dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
           FROM toks GROUP BY tok)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(1000000 // d.df) AS BIGINT) AS rarity_score
FROM toks t JOIN dfreq d USING (tok)
GROUP BY t.doc_id
""",
        # add-one-smoothed bigram-LM surprisal (integer inverse-probability
        # form — see text/ops.lm_surprisal_scores for why not log-space)
        "doc_lm_surprisal": """
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') t
  FROM documents),
 flat AS (SELECT unnest(t) tok FROM tk),
 v AS (SELECT count(DISTINCT tok) v FROM flat),
 pairs AS (
  SELECT doc_id, unnest(t[1:-2]) w1, unnest(t[2:-1]) w2
  FROM tk WHERE len(t) >= 2),
 big AS (SELECT w1, w2, count(*) c12 FROM pairs GROUP BY 1, 2),
 ctx AS (SELECT w1, count(*) c1 FROM pairs GROUP BY 1)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(((ctx.c1 + v.v) * 1000000) // (big.c12 + 1)) AS BIGINT)
           AS lm_surprisal
FROM pairs p
CROSS JOIN v
JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
JOIN ctx ON ctx.w1 = p.w1
GROUP BY p.doc_id
""",
        "doc_pii_scrub": f"""
WITH inj AS (
  SELECT source,
    CASE WHEN doc_id % 11 = 0
         THEN base || ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
         ELSE base END AS text
  FROM (
    SELECT source, doc_id,
      CASE WHEN doc_id % 7 = 0
           THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
           ELSE text END AS base
    FROM documents)
)
SELECT source,
  CAST(count(*) AS BIGINT) n_docs,
  CAST(sum(len(regexp_extract_all(text, '{ops.PII_EMAIL_RE}'))) AS BIGINT) n_emails,
  CAST(sum(len(regexp_extract_all(text, '{ops.PII_PHONE_RE}'))) AS BIGINT) n_phones,
  CAST(sum(length(text) - length(
    regexp_replace(regexp_replace(text, '{ops.PII_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{ops.PII_PHONE_RE}', '[PHONE]', 'g'))) AS BIGINT) chars_removed
FROM inj GROUP BY source
""",
        "doc_lang_id": _lang_sql(),
        "doc_token_cms": f"""
SELECT cell, cnt FROM read_parquet('{F}/witness_cms.parquet')
""",
        "doc_lang_confusion": f"""
WITH L AS ({_lang_sql()})
SELECT pred_lang, lang, CAST(count(*) AS BIGINT) AS n
FROM L GROUP BY pred_lang, lang
""",
        "doc_jaccard_query": """
WITH d AS (SELECT doc_id, regexp_extract_all(text, '\\S+') toks FROM documents),
 s AS (SELECT doc_id,
        CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END sh
       FROM d),
 q AS (SELECT sh qsh FROM s WHERE doc_id = 0)
SELECT s.doc_id,
  CAST(round(len(list_intersect(s.sh, q.qsh))::DOUBLE
       / len(list_distinct(list_concat(s.sh, q.qsh))), 4) AS DOUBLE) sim
FROM s, q ORDER BY sim DESC, s.doc_id LIMIT 20
""",
        "cluster_doc_stats": """
WITH c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id < 8),
 s AS (SELECT e.vec_id, c.cid,
        list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) sim
       FROM embeddings e, c),
 -- tie-break pinned to MIN centroid id on equal similarity = np.argmax's
 -- first-max over ascending centroid ids (arg_max leaves ties unspecified)
 a AS (SELECT vec_id, min(cid) centroid
       FROM (SELECT vec_id, cid, sim,
                    max(sim) OVER (PARTITION BY vec_id) ms FROM s)
       WHERE sim = ms GROUP BY vec_id)
SELECT CAST(a.centroid AS BIGINT) centroid,
       CAST(count(*) AS BIGINT) n_docs,
       CAST(sum(d.n_chars) AS BIGINT) sum_chars,
       CAST(sum(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) n_en
FROM a JOIN documents d ON d.doc_id = a.vec_id
GROUP BY a.centroid
""",
        "ann_ivfpq_topk": f"""
SELECT qid, vec_id, adist_ppm, rank
FROM read_parquet('{F}/witness_ivfpq_topk.parquet')
""",
        "emb_pq": f"""
SELECT vec_id, c0, c1, c2, c3, err_ppm
FROM read_parquet('{F}/witness_pq_codes.parquet')
""",
        "emb_quantize": """
WITH t AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 m AS (SELECT vec_id, e,
        list_max(list_transform(e, x -> abs(x))) ma FROM t),
 q AS (SELECT vec_id, ma,
        list_transform(e, x -> floor(x * 127.0 /
            (CASE WHEN ma = 0 THEN 1.0 ELSE ma END) + 0.5)) ql
       FROM m)
SELECT CAST(vec_id AS BIGINT) vec_id, CAST(ma AS DOUBLE) maxabs,
       CAST(list_sum(ql) AS BIGINT) sum_q,
       CAST(list_sum(list_transform(ql, x -> abs(x))) AS BIGINT) sum_abs_q,
       CAST(len(list_filter(ql, x -> abs(x) = 127.0)) AS BIGINT) n_sat
FROM q
""",
        "ann_topk": """
WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id IN (0, 1, 2))
SELECT q.qid, e.vec_id,
  CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS DOUBLE) sim,
  CAST(row_number() OVER (PARTITION BY q.qid
        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) DESC,
                 e.vec_id) AS BIGINT) rank
FROM embeddings e, q WHERE e.vec_id <> q.qid
QUALIFY rank <= 10
""",
        # TPC-H Q10 analog: 3-way join + group + top-k; ORDER BY uses the
        # ROUNDED revenue on both sides so the k boundary cannot flip
        "returned_item_revenue": """
WITH r AS (
  SELECT o.o_custkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) rev,
         count(*) n_items
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey)
SELECT CAST(c.c_custkey AS BIGINT) c_custkey, c.c_name, n.n_name,
       CAST(round(r.rev, 2) AS DOUBLE) revenue,
       CAST(r.n_items AS BIGINT) n_items
FROM r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY round(r.rev, 2) DESC, c.c_custkey
LIMIT 20
""",
        # TPC-H Q18 analog: HAVING-filtered aggregate semi-join; ORDER BY a
        # raw stored column (o_totalprice), so no float-reassociation risk
        "large_order_customers": """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) sq FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
SELECT CAST(o.o_custkey AS BIGINT) c_custkey, c.c_name,
       CAST(o.o_orderkey AS BIGINT) o_orderkey, o.o_orderdate,
       o.o_totalprice, CAST(round(big.sq, 2) AS DOUBLE) sum_qty
FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
        # TPC-H Q5 analog: multiway star join, same-nation customer/supplier,
        # one region; revenue ordering on the ROUNDED sum both sides
        "local_supplier_revenue": """
SELECT n.n_name, CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                      AS DOUBLE) revenue,
       CAST(count(*) AS BIGINT) n
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) DESC, n.n_name
""",
        # TPC-H Q3 analog: segment semi-join + date-split fact join;
        # ORDER BY the ROUNDED revenue both sides so the k boundary holds
        "top_unshipped_orders": """
SELECT CAST(l.l_orderkey AS BIGINT) o_orderkey,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
            AS DOUBLE) revenue,
       o.o_orderdate, o.o_orderpriority,
       CAST(count(*) AS BIGINT) n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-05-15'
  AND l.l_shipdate > TIMESTAMP '1998-05-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) DESC,
         o.o_orderdate, l.l_orderkey
LIMIT 10
""",
        # TPC-H Q16-style exact COUNT(DISTINCT): all-integer, bit-exact
        "brand_supplier_counts": """
SELECT p.p_brand,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) n_suppliers,
       CAST(count(*) AS BIGINT) n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size < 25
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
        # TPC-H Q7 analog: two-nation shipping volume by year; revenue
        # ordering plays no role (keys are the sort), sums rounded 2-dec
        "nation_trade_volume": """
SELECT n1.n_name supp_nation, n2.n_name cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) l_year,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
            AS DOUBLE) revenue,
       CAST(count(*) AS BIGINT) n
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
        # TPC-H Q14 analog: promo revenue share; the pct is computed from
        # the two ROUNDED sums on both sides (deterministic operands)
        "promo_revenue": """
WITH s AS (
  SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END), 2) pr,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) tr,
         count(*) n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
    AND l.l_shipdate < TIMESTAMP '1997-10-01')
SELECT CAST(pr AS DOUBLE) promo_revenue, CAST(tr AS DOUBLE) total_revenue,
       CAST(round(100.0 * pr / tr, 4) AS DOUBLE) promo_pct,
       CAST(n AS BIGINT) n_items
FROM s
""",
        # TPC-H Q19 analog: OR-of-ANDs (brand, size, quantity) brackets
        "bracket_revenue": """
WITH b AS (
  SELECT CASE
    WHEN p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         AND l.l_quantity BETWEEN 1 AND 11 THEN 'B1'
    WHEN p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         AND l.l_quantity BETWEEN 10 AND 20 THEN 'B2'
    WHEN p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity BETWEEN 20 AND 30 THEN 'B3' END bracket,
    l.l_extendedprice * (1 - l.l_discount) rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
SELECT bracket, CAST(round(sum(rev), 2) AS DOUBLE) revenue,
       CAST(count(*) AS BIGINT) n
FROM b WHERE bracket IS NOT NULL
GROUP BY bracket ORDER BY bracket
""",
        # TPC-H Q22 analog: above-positive-average balance + NO order since
        # the cutoff (anti-join); the average test is integer cents·n > Σ
        "dormant_customer_balance": """
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) cents
  FROM customer),
 a AS (SELECT sum(cents) s, count(*) n FROM pos WHERE cents > 0),
 recent AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-01-01'),
 q AS (SELECT p.c_nationkey, p.cents
       FROM pos p, a
       WHERE p.cents * a.n > a.s
         AND p.c_custkey NOT IN (SELECT o_custkey FROM recent))
SELECT CAST(c_nationkey AS BIGINT) c_nationkey,
       CAST(count(*) AS BIGINT) n_cust,
       CAST(sum(cents) AS DOUBLE) / 100 total_acctbal
FROM q GROUP BY 1 ORDER BY 1
""",
        # TPC-H Q13 analog: customer order-count distribution incl.
        # zero-order customers (left join + double groupby, exact int64)
        "customer_order_distribution": """
WITH pc AS (
  SELECT c.c_custkey, count(o.o_custkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT CAST(n_orders AS BIGINT) n_orders, CAST(count(*) AS BIGINT) n_cust
FROM pc GROUP BY n_orders ORDER BY n_cust DESC, n_orders DESC
""",
        # TPC-H Q15 analog: max-revenue supplier(s) over a 3-month ship
        # window; revenue is EXACT int64 1e-4-dollar units so the max
        # boundary and ties are integer equality on both sides
        "top_supplier_revenue": """
WITH r AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT CAST(s.s_suppkey AS BIGINT) s_suppkey, s.s_name,
       CAST(r.rev4 AS DOUBLE) / 10000.0 total_revenue
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev4 = (SELECT max(rev4) FROM r)
ORDER BY s_suppkey
""",
        # TPC-H Q17 analog: revenue from below-20%-of-part-average
        # quantities; the threshold is the integer test 5·qty·n < Σqty and
        # avg_yearly is cents/700.0 — identical expressions both sides
        "small_quantity_revenue": """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
 th AS (SELECT l_partkey, sum(CAST(round(l_quantity) AS BIGINT)) s,
               count(*) n
        FROM lineitem JOIN bp ON bp.p_partkey = l_partkey
        GROUP BY l_partkey)
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
            AS DOUBLE) / 700.0 avg_yearly,
       CAST(count(*) AS BIGINT) n_lines
FROM lineitem l JOIN th ON th.l_partkey = l.l_partkey
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * th.n < th.s
""",
        # TPC-H Q8 analog: one nation's share of a region's yearly revenue
        # for a part type; revenue is EXACT int64 1e-4-dollar units so the
        # mkt_share ratio is the identical double division both sides
        "market_share_by_year": """
WITH eu AS (SELECT n.n_nationkey FROM nation n
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'),
 tgt AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3'),
 rv AS (
  SELECT CAST(year(l.l_shipdate) AS BIGINT) AS "year",
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) rev4,
         s.s_nationkey IN (SELECT n_nationkey FROM tgt) is_tgt
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE p.p_type = 'ECONOMY'
    AND s.s_nationkey IN (SELECT n_nationkey FROM eu)),
 g AS (SELECT "year", sum(CASE WHEN is_tgt THEN rev4 ELSE 0 END) t,
              sum(rev4) tot, count(*) n_lines
       FROM rv GROUP BY "year")
SELECT "year", CAST(t AS DOUBLE) / 10000.0 target_revenue,
       CAST(tot AS DOUBLE) / 10000.0 total_revenue,
       CAST(t AS DOUBLE) / CAST(tot AS DOUBLE) mkt_share,
       CAST(n_lines AS BIGINT) n_lines
FROM g ORDER BY "year"
""",
        # TPC-H Q12 analog: ship-year lag buckets (orderdate→shipdate, exact
        # integer days — both timestamps midnight) split by order priority
        "shipping_lag_distribution": """
WITH j AS (
  SELECT date_diff('day', o.o_orderdate, l.l_shipdate) lag,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END hi
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01')
SELECT CASE WHEN lag < 30 THEN 'FAST'
            WHEN lag < 90 THEN 'MEDIUM' ELSE 'SLOW' END bucket,
       CAST(sum(hi) AS BIGINT) high_lines,
       CAST(sum(1 - hi) AS BIGINT) low_lines
FROM j GROUP BY 1 ORDER BY 1
""",
        # daily new/cumulative distinct users: distinct-over-history as
        # count-by-first-seen-day; exact integer counts both sides
        "events_cumulative_distinct": """
WITH f AS (SELECT user_id, min(date_trunc('day', ts)) d
           FROM events GROUP BY user_id),
 c AS (SELECT d, count(*) new_users FROM f GROUP BY d)
SELECT CAST(d AS TIMESTAMP) "day", CAST(new_users AS BIGINT) new_users,
       CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT) cum_users
FROM c ORDER BY "day"
""",
        # top-k URL domains over deterministically injected URLs (the
        # pii_scrub recipe): injection + regex reproduced in SQL
        "doc_url_domains": """
WITH t AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' see http://host' || (doc_id % 13)
                      || '.example.org/p' || (doc_id % 5) ELSE '' END
         || CASE WHEN doc_id % 10 = 0
                 THEN ' via https://cdn' || (doc_id % 4) || '.example.net'
                 ELSE '' END AS txt
  FROM documents),
 u AS (SELECT doc_id,
              unnest(regexp_extract_all(
                  txt, 'https?://([A-Za-z0-9.-]+)(?:/[^\\s]*)?', 1)) AS "domain"
       FROM t)
SELECT "domain", CAST(count(*) AS BIGINT) n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) n_docs
FROM u GROUP BY "domain" ORDER BY n_urls DESC, "domain" LIMIT 15
""",
        # TPC-H Q6 analog: discount-band revenue; all predicates on rounded
        # integers, revenue an exact int64 sum divided once
        "forecast_revenue": """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) cents,
         CAST(round(l_discount * 100) AS BIGINT) pct,
         CAST(round(l_quantity) AS BIGINT) qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01')
SELECT CAST(coalesce(sum(cents * pct), 0) AS DOUBLE) / 10000.0 revenue,
       CAST(count(*) AS BIGINT) n_lines
FROM f WHERE pct BETWEEN 5 AND 7 AND qty < 24
""",
        # TPC-H Q4 analog: quarter orders with >=1 line shipped more than
        # 90 days after the order date (EXISTS -> max-lag aggregate), per
        # priority; lag is exact integer days (midnight timestamps)
        "priority_late_orders": """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-04-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND date_diff('day', o.o_orderdate, l.l_shipdate) > 90)
GROUP BY 1 ORDER BY 1
""",
        # TPC-H Q9 analog: per (supplier nation, ship year) profit on
        # name-matched parts; profit = rev4 - 60*qty*retail_cents, all
        # exact int64 1e-4-dollar units divided once at the end
        "nation_profit": """
SELECT n.n_name nation, CAST(year(l.l_shipdate) AS BIGINT) o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                - 60 * CAST(round(l.l_quantity) AS BIGINT)
                  * CAST(round(p.p_retailprice * 100) AS BIGINT))
            AS DOUBLE) / 10000.0 profit,
       CAST(count(*) AS BIGINT) n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # TPC-H Q21 analog: unique-latest-shipper blame counts on
        # multi-supplier orders; "latest" and uniqueness are exact integer
        # timestamp comparisons on both sides
        "late_supplier_count": """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) mx
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
 per_order AS (
  SELECT l_orderkey, max(mx) gmax, count(*) n_supp
  FROM pairs GROUP BY l_orderkey),
 blamed AS (
  SELECT p.l_orderkey, count(*) n_at_max, min(p.l_suppkey) skey,
         max(o.n_supp) n_supp
  FROM pairs p JOIN per_order o USING (l_orderkey)
  WHERE p.mx = o.gmax
  GROUP BY p.l_orderkey)
SELECT CAST(s.s_suppkey AS BIGINT) s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) numwait
FROM blamed b JOIN supplier s ON s.s_suppkey = b.skey
WHERE b.n_at_max = 1 AND b.n_supp >= 2
GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey
""",
        # per-user z-score outliers: moments are exact int64 cents sums, the
        # z expression is the IDENTICAL double formula on both sides
        "events_zscore_outliers": """
WITH e AS (SELECT event_id, user_id,
                  CAST(round(value * 100) AS BIGINT) cents
           FROM events WHERE event_type = 'purchase'),
 m AS (SELECT user_id, count(*) n, sum(cents) s, sum(cents * cents) ss
       FROM e GROUP BY user_id),
 z AS (SELECT e.event_id, e.user_id, e.cents,
              (e.cents - CAST(m.s AS DOUBLE) / m.n)
              / sqrt((m.ss - CAST(m.s AS DOUBLE) * m.s / m.n) / (m.n - 1)) z
       FROM e JOIN m USING (user_id)
       WHERE m.n >= 5
         AND (m.ss - CAST(m.s AS DOUBLE) * m.s / m.n) / (m.n - 1) > 0)
SELECT CAST(event_id AS BIGINT) event_id, CAST(user_id AS BIGINT) user_id,
       CAST(cents AS BIGINT) cents, CAST(round(z, 6) AS DOUBLE) z
FROM z WHERE abs(z) > 2 ORDER BY event_id
""",
        # RFM quartiles by EXACT global rank under (metric, user_id) —
        # tier = 0-based-rank * 4 // n, the tie-proof deterministic NTILE
        "events_rfm": """
WITH g AS (SELECT max(ts) tmax FROM events),
 u AS (SELECT user_id,
              (epoch_us(tmax) - epoch_us(max(ts))) // 86400000000 r_days,
              count(*) freq,
              sum(CAST(round(value * 100) AS BIGINT)) cents
       FROM events, g GROUP BY user_id, tmax),
 n AS (SELECT count(*) nu FROM u),
 r AS (SELECT u.*,
        (row_number() OVER (ORDER BY r_days, user_id) - 1) * 4 // nu r_tier,
        (row_number() OVER (ORDER BY freq, user_id) - 1) * 4 // nu f_tier,
        (row_number() OVER (ORDER BY cents, user_id) - 1) * 4 // nu m_tier
       FROM u, n)
SELECT CAST(user_id AS BIGINT) user_id, CAST(r_days AS BIGINT) r_days,
       CAST(freq AS BIGINT) freq, CAST(cents AS BIGINT) cents,
       CAST(r_tier AS BIGINT) r_tier, CAST(f_tier AS BIGINT) f_tier,
       CAST(m_tier AS BIGINT) m_tier
FROM r ORDER BY user_id
""",
        # top-k 3-step event-type paths under the (ts, event_id) total order
        "events_path_trigrams": """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w e2,
                  lead(event_type, 2) OVER w e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type || '>' || e2 || '>' || e3 AS path,
       CAST(count(*) AS BIGINT) n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
""",
        # LSH-bucketed ANN: sign-bit bucket words over the first-8-vector
        # hyperplanes (sign margin >=4e-7 vs ~1e-14 cross-engine dot error),
        # Hamming<=1 probe, exact rerank with the brute_force tie-break
        "ann_lsh_topk": """
WITH p AS (SELECT vec_id pid, embedding pe FROM embeddings WHERE vec_id < 8),
 b AS (SELECT e.vec_id,
        CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                                            p.pe::DOUBLE[]) > 0
                 THEN 1 << pid ELSE 0 END) AS BIGINT) bucket
       FROM embeddings e, p GROUP BY e.vec_id),
 q AS (SELECT b.vec_id qid, b.bucket qb, e.embedding qe
       FROM b JOIN embeddings e USING (vec_id)
       WHERE b.vec_id IN (100, 101, 102)),
 cand AS (SELECT q.qid, b.vec_id,
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              q.qe::DOUBLE[]), 6) sim
          FROM q JOIN b ON bit_count(xor(b.bucket, q.qb)) <= 1
          JOIN embeddings e ON e.vec_id = b.vec_id
          WHERE b.vec_id != q.qid)
SELECT CAST(qid AS BIGINT) qid, CAST(vec_id AS BIGINT) vec_id, sim,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
            AS BIGINT) rank
FROM cand
QUALIFY rank <= 5
""",
        # SemDeDup: same seed-centroid assignment as ann_ivf_assign, then a
        # per-cluster lower-id-wins pairwise prune at cosine > 0.44
        "emb_semdedup": """
WITH c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id < 8),
 s AS (SELECT e.vec_id, c.cid,
        list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) sim
       FROM embeddings e, c),
 a AS (SELECT vec_id, min(cid) centroid
       FROM (SELECT vec_id, cid, sim,
                    max(sim) OVER (PARTITION BY vec_id) ms FROM s)
       WHERE sim = ms GROUP BY vec_id),
 ae AS (SELECT a.vec_id, a.centroid, e.embedding
        FROM a JOIN embeddings e USING (vec_id)),
 dropped AS (SELECT DISTINCT hi.vec_id
             FROM ae lo JOIN ae hi
               ON lo.centroid = hi.centroid AND lo.vec_id < hi.vec_id
              AND list_cosine_similarity(lo.embedding::DOUBLE[],
                                         hi.embedding::DOUBLE[]) > 0.44)
SELECT CAST(ae.vec_id AS BIGINT) vec_id, CAST(ae.centroid AS BIGINT) centroid,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) kept
FROM ae LEFT JOIN dropped d ON ae.vec_id = d.vec_id
""",
        "ann_ivf_assign": """
WITH c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id < 8),
 s AS (SELECT e.vec_id, c.cid,
        list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) sim
       FROM embeddings e, c),
 -- tie-break pinned to MIN centroid id on equal similarity = np.argmax's
 -- first-max over ascending centroid ids (arg_max leaves ties unspecified)
 a AS (SELECT vec_id, min(cid) centroid
       FROM (SELECT vec_id, cid, sim,
                    max(sim) OVER (PARTITION BY vec_id) ms FROM s)
       WHERE sim = ms GROUP BY vec_id)
SELECT CAST(centroid AS BIGINT) centroid, CAST(count(*) AS BIGINT) n
FROM a GROUP BY centroid
""",
        "events_hourly": """
SELECT date_trunc('hour', ts) win_start, event_type,
       CAST(round(sum(value), 2) AS DOUBLE) sum_value, CAST(count(*) AS BIGINT) n
FROM events GROUP BY 1, 2
""",
        "events_sliding": """
SELECT to_timestamp(floor(epoch(ts) / 900) * 900 - k.range * 900)::TIMESTAMP win_start,
       event_type,
       CAST(round(sum(value), 2) AS DOUBLE) sum_value, CAST(count(*) AS BIGINT) n
FROM events, range(4) k GROUP BY 1, 2
""",
        # greedy ordered funnel: first view, first later click, first later
        # purchase, all within 48h of the first view (µs-exact arithmetic)
        "events_funnel": """
WITH s1 AS (SELECT user_id, min(ts) t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
 s2 AS (SELECT e.user_id, min(e.ts) t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 48 HOUR
        GROUP BY e.user_id),
 s3 AS (SELECT e.user_id, min(e.ts) t3
        FROM events e JOIN s1 ON e.user_id = s1.user_id
                      JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s1.t1 + INTERVAL 48 HOUR
        GROUP BY e.user_id)
SELECT CAST(s1.user_id AS BIGINT) user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) reached,
       CAST(coalesce(epoch_us(s3.t3) - epoch_us(s1.t1), -1) AS BIGINT)
           us_to_last
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
""",
        "events_error_asof": """
SELECT CAST(c.event_id AS BIGINT) AS event_id,
       CAST(c.user_id AS BIGINT) AS user_id,
       CAST(coalesce(epoch_us(c.ts) - epoch_us(e.ts), -1) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id AND c.ts >= e.ts
""",
        "events_error_range_join": """
SELECT CAST(c.event_id AS BIGINT) AS event_id,
       CAST(count(e.event_id) AS BIGINT) AS n_err
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON e.ts BETWEEN c.ts - INTERVAL 60 SECOND AND c.ts + INTERVAL 60 SECOND
GROUP BY c.event_id
""",
        "events_sessions": """
WITH d AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL '30 minutes' THEN 1 ELSE 0 END brk
  FROM events),
 s AS (SELECT user_id, ts,
        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) sess
       FROM d),
 g AS (SELECT user_id, sess, count(*) n_ev,
        epoch(max(ts) - min(ts)) dur
       FROM s GROUP BY user_id, sess)
SELECT user_id, CAST(count(*) AS BIGINT) n_sessions,
       CAST(sum(n_ev) AS BIGINT) n_events,
       CAST(max(dur) AS DOUBLE) max_session_secs
FROM g GROUP BY user_id
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity), 2) AS DOUBLE) sum_qty,
       CAST(round(sum(l_extendedprice), 2) AS DOUBLE) sum_base,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) sum_rev,
       CAST(count(*) AS BIGINT) n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "revenue_by_brand": """
SELECT p.p_brand,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) revenue,
       CAST(count(*) AS BIGINT) n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
        "orders_running_total": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS run_cents
FROM orders
""",
        "events_retention": """
WITH p AS (SELECT DISTINCT user_id,
                  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
           FROM events),
 act AS (SELECT day, count(*) AS n_active FROM p GROUP BY day),
 ret AS (SELECT a.day, count(*) AS n_ret
         FROM p a JOIN p b
           ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
         GROUP BY a.day)
SELECT act.day, CAST(act.n_active AS BIGINT) AS n_active,
       CAST(coalesce(ret.n_ret, 0) AS BIGINT) AS n_retained
FROM act LEFT JOIN ret USING (day)
""",
        "events_hll": f"""
SELECT reg, rho FROM read_parquet('{F}/witness_hll.parquet')
""",
        "events_top_users": """
SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
       CAST(n_events AS BIGINT) AS n_events, CAST(rank AS BIGINT) AS rank
FROM (SELECT event_type, user_id, count(*) AS n_events,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id) AS rank
      FROM events GROUP BY event_type, user_id)
WHERE rank <= 3
""",
        "order_priority_revenue": """
SELECT o.o_orderpriority,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) revenue,
       CAST(count(*) AS BIGINT) n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
        "segment_orders": """
SELECT c.c_mktsegment,
       CAST(round(sum(o.o_totalprice), 2) AS DOUBLE) total,
       CAST(count(*) AS BIGINT) n
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
        # ---- witness-parquet oracles: the op is not SQL-expressible, so a
        # single-process whole-array/scalar implementation (text/witness.py,
        # fixtures._ensure_tile_witnesses) writes the expected rows at
        # fixture time and the oracle just reads them.
        "line_cells": f"""
SELECT ordinal, gr, gc, x, y, z FROM read_parquet('{F}/witness_line_cells.parquet')
""",
        "s2_cell_counts": f"""
SELECT cell_token, n_tiles, min_tile FROM read_parquet('{F}/witness_s2_cells.parquet')
""",
        "s2_footprint_cover": f"""
SELECT cell_token, n_tiles FROM read_parquet('{F}/witness_s2_cover.parquet')
""",
        # pure-geometric bbox join: verifies the ENGINE's S2-bucketed join
        # end-to-end with no S2 on the oracle side (tile extents recovered
        # from the pixel witness: centre ± cs/2 is exact in fp for the
        # fixture grid constants)
        "s2_gauge_join": f"""
WITH ext AS (
  SELECT tile_id, min(x) - 2.5 xmin, max(x) + 2.5 xmax,
         min(y) - 2.5 ymin, max(y) + 2.5 ymax
  FROM {_PX} GROUP BY tile_id)
SELECT e.tile_id image_id, CAST(count(*) AS BIGINT) n_gauges
FROM ext e JOIN read_parquet('{F}/gauges_large.parquet') g
  ON g.x >= e.xmin AND g.x < e.xmax AND g.y >= e.ymin AND g.y < e.ymax
GROUP BY e.tile_id
""",
        "knn_idw_surface": f"""
SELECT image_id, n_px, n_valid, sum_z FROM read_parquet('{F}/witness_knn_idw.parquet')
""",
        "knn_idw_partitioned": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_knn_partitioned.parquet')
""",
        "linear_interp_surface": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_linear_interp.parquet')
""",
        "channel_surface": f"""
SELECT image_id, n_px, n_valid, sum_z FROM read_parquet('{F}/witness_channel.parquet')
""",
        "remove_block": f"""
SELECT image_id, n_px, n_valid, sum_z FROM read_parquet('{F}/witness_remove_block.parquet')
""",
        "to_int_hist": f"""
SELECT neg, pos, zero, sum_round FROM read_parquet('{F}/witness_to_int.parquet')
""",
        "resample_bilinear": f"""
SELECT n_px, n_valid, sum_z, min_z, max_z
FROM read_parquet('{F}/witness_resample_bilinear.parquet')
""",
        "resample_methods": f"""
SELECT method, n_valid, sum_z, min_z, max_z
FROM read_parquet('{F}/witness_resample_methods.parquet')
""",
        "reproject_affine": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_reproject.parquet')
""",
        "reproject_tmerc": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_reproject_tmerc.parquet')
""",
        "reproject_utm": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_reproject_utm.parquet')
""",
        "hillshade_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_hillshade.parquet')
""",
        "tile_png16_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_png16.parquet')
""",
        "focal_mean_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_focal_mean.parquet')
""",
        "focal_range_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_focal_range.parquet')
""",
        "focal_median_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_focal_median.parquet')
""",
        # morphological opening reproduced INDEPENDENTLY in SQL: two
        # chained 3×3 neighbor self-joins (equi-join on an offsets table;
        # min/max ignore NULLs = NaN-aware focal semantics, LEFT JOIN keeps
        # hole cells so pass 2 sees pass 1's hole-filling). Morphology only
        # SELECTS values, so min/max are exact; only the per-tile sum is
        # rounded (summation order), like every per_tile_stats query.
        "morph_open_stats": f"""
WITH offs AS (
  SELECT t1.dr, t2.dc
  FROM (VALUES (-1), (0), (1)) t1(dr), (VALUES (-1), (0), (1)) t2(dc)),
 e AS (
  SELECT a.tile_id, a.gr, a.gc, min(b.z) ze
  FROM {_PX} a
  CROSS JOIN offs o
  LEFT JOIN {_PX} b
    ON b.gr = a.gr + o.dr AND b.gc = a.gc + o.dc AND b.z IS NOT NULL
  GROUP BY a.tile_id, a.gr, a.gc),
 d AS (
  SELECT a.tile_id, a.gr, a.gc, max(b.ze) zo
  FROM e a
  CROSS JOIN offs o
  LEFT JOIN e b
    ON b.gr = a.gr + o.dr AND b.gc = a.gc + o.dc AND b.ze IS NOT NULL
  GROUP BY a.tile_id, a.gr, a.gc)
SELECT tile_id AS image_id, CAST(count(*) AS BIGINT) n_px,
       CAST(count(zo) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(zo), 0), 2) AS DOUBLE) sum_z
FROM d GROUP BY tile_id
""",
        # 5×5 binomial Gaussian blur reproduced INDEPENDENTLY in SQL: two
        # chained pivoted 3×3 self-joins evaluating the engine kernel's
        # exact fixed-order weighted expression (integer weights, /16
        # power-of-two, CAST to FLOAT between passes = f32 tile storage)
        # — bit-exact per cell; only the per-tile sum is rounded
        # (summation order), like every per_tile_stats query.
        "gauss_blur_stats": f"""
WITH offs AS (
  SELECT t1.dr, t2.dc
  FROM (VALUES (-1), (0), (1)) t1(dr), (VALUES (-1), (0), (1)) t2(dc)),
 px AS (SELECT tile_id, gr, gc, z FROM {_PX}),{_blur_pass_sql("px", "b1")},{_blur_pass_sql("b1", "b2")}
SELECT tile_id AS image_id, CAST(count(*) AS BIGINT) n_px,
       CAST(count(z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM b2 GROUP BY tile_id
""",
        # LBP texture codes reproduced INDEPENDENTLY in SQL: one weighted
        # 3x3 neighbor self-join evaluating the identical eight >=
        # comparisons in the fixed clockwise bit order (stages/lbp.py);
        # strict window = exactly 8 finite neighbors + a finite centre
        "lbp_hist": f"""
WITH offs AS (
  SELECT * FROM (VALUES (-1, -1, 1), (-1, 0, 2), (-1, 1, 4), (0, 1, 8),
                        (1, 1, 16), (1, 0, 32), (1, -1, 64), (0, -1, 128))
       o(dr, dc, w)),
 nb AS (
  SELECT a.gr, a.gc, count(b.z) nf,
         sum(CASE WHEN b.z >= a.z THEN o.w ELSE 0 END) code
  FROM {_PX} a
  CROSS JOIN offs o
  LEFT JOIN {_PX} b
    ON b.gr = a.gr + o.dr AND b.gc = a.gc + o.dc AND b.z IS NOT NULL
  WHERE a.z IS NOT NULL
  GROUP BY a.gr, a.gc)
SELECT CAST(code AS BIGINT) code, CAST(count(*) AS BIGINT) n_cells
FROM nb WHERE nf = 8 GROUP BY 1
""",
        # 2x overview pyramid reproduced INDEPENDENTLY in SQL: three
        # chained group-and-pivot reductions evaluating the engine's exact
        # fixed-order NaN-aware mean contract (stages/pyramid.py), with the
        # f32 storage round-trip (CAST AS FLOAT) between levels
        "pyramid_stats": f"""
WITH p0 AS (SELECT gr, gc, CAST(z AS DOUBLE) z FROM {_PX}),
 l1 AS (
  SELECT pr gr, pc gc, CAST(CAST(CASE WHEN n > 0 THEN s / n END AS FLOAT)
                            AS DOUBLE) z
  FROM (
    SELECT gr // 2 pr, gc // 2 pc,
      ((coalesce(max(CASE WHEN gr % 2 = 0 AND gc % 2 = 0 THEN z END), 0)
        + coalesce(max(CASE WHEN gr % 2 = 0 AND gc % 2 = 1 THEN z END), 0))
       + coalesce(max(CASE WHEN gr % 2 = 1 AND gc % 2 = 0 THEN z END), 0))
      + coalesce(max(CASE WHEN gr % 2 = 1 AND gc % 2 = 1 THEN z END), 0) s,
      count(z) n
    FROM p0 GROUP BY 1, 2)),
 l2 AS (
  SELECT pr gr, pc gc, CAST(CAST(CASE WHEN n > 0 THEN s / n END AS FLOAT)
                            AS DOUBLE) z
  FROM (
    SELECT gr // 2 pr, gc // 2 pc,
      ((coalesce(max(CASE WHEN gr % 2 = 0 AND gc % 2 = 0 THEN z END), 0)
        + coalesce(max(CASE WHEN gr % 2 = 0 AND gc % 2 = 1 THEN z END), 0))
       + coalesce(max(CASE WHEN gr % 2 = 1 AND gc % 2 = 0 THEN z END), 0))
      + coalesce(max(CASE WHEN gr % 2 = 1 AND gc % 2 = 1 THEN z END), 0) s,
      count(z) n
    FROM l1 GROUP BY 1, 2)),
 l3 AS (
  SELECT pr gr, pc gc, CAST(CAST(CASE WHEN n > 0 THEN s / n END AS FLOAT)
                            AS DOUBLE) z
  FROM (
    SELECT gr // 2 pr, gc // 2 pc,
      ((coalesce(max(CASE WHEN gr % 2 = 0 AND gc % 2 = 0 THEN z END), 0)
        + coalesce(max(CASE WHEN gr % 2 = 0 AND gc % 2 = 1 THEN z END), 0))
       + coalesce(max(CASE WHEN gr % 2 = 1 AND gc % 2 = 0 THEN z END), 0))
      + coalesce(max(CASE WHEN gr % 2 = 1 AND gc % 2 = 1 THEN z END), 0) s,
      count(z) n
    FROM l2 GROUP BY 1, 2))
SELECT CAST(1 AS BIGINT) AS "level",
       printf('t%04d_%04d', gr // 64, gc // 64) image_id,
       CAST(count(*) AS BIGINT) n_px, CAST(count(z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM l1 GROUP BY 1, 2
UNION ALL
SELECT CAST(2 AS BIGINT) AS "level",
       printf('t%04d_%04d', gr // 64, gc // 64) image_id,
       CAST(count(*) AS BIGINT) n_px, CAST(count(z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM l2 GROUP BY 1, 2
UNION ALL
SELECT CAST(3 AS BIGINT) AS "level",
       printf('t%04d_%04d', gr // 64, gc // 64) image_id,
       CAST(count(*) AS BIGINT) n_px, CAST(count(z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM l3 GROUP BY 1, 2
""",
        # Sobel gradient magnitude reproduced INDEPENDENTLY in SQL: one
        # pivoted 3x3 self-join evaluating the identical fixed-order
        # gx/gy/sqrt expressions (stages/sobel.py exactness contract)
        "sobel_stats": f"""
WITH offs AS (
  SELECT t1.dr, t2.dc
  FROM (VALUES (-1), (0), (1)) t1(dr), (VALUES (-1), (0), (1)) t2(dc)),
 px AS (SELECT tile_id, gr, gc, z FROM {_PX}),{_sobel_sql()}
SELECT tile_id AS image_id, CAST(count(*) AS BIGINT) n_px,
       CAST(count(z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM sb GROUP BY tile_id
""",
        # NCC template matching reproduced INDEPENDENTLY in SQL: pivoted
        # 3x3 self-join + plain-column CTE layers evaluating the identical
        # fixed-order mean/num/den/sqrt chain (stages/ncc.py contract)
        "ncc_stats": f"""
WITH offs AS (
  SELECT t1.dr, t2.dc
  FROM (VALUES (-1), (0), (1)) t1(dr), (VALUES (-1), (0), (1)) t2(dc)),
 px AS (SELECT tile_id, gr, gc, z FROM {_PX}),{_ncc_sql()}
SELECT tile_id AS image_id, CAST(count(*) AS BIGINT) n_px,
       CAST(count(z) AS BIGINT) n_valid,
       CAST(round(coalesce(sum(z), 0), 2) AS DOUBLE) sum_z
FROM nc GROUP BY tile_id
""",
        # bounded Chebyshev distance transform reproduced INDEPENDENTLY in
        # SQL: 4 chained min-plus sweeps (each one 3×3 neighbor self-join
        # over the valid pixels; the (0,0) offset keeps the cell's own
        # distance, min ignores NULL = +inf-like unreached). Distances are
        # small integers — exact, no rounding anywhere. The shifted keys
        # (gr+dr, gc+dc) are hoisted into a projection BEFORE the join so
        # DuckDB plans a hash join on pure column equality — with the
        # arithmetic inline in the ON clause it planned a CROSS_PRODUCT
        # nested loop (227k × 9 × 227k comparisons, minutes per sweep).
        "dist_transform_hist": f"""
WITH offs AS (
  SELECT t1.dr, t2.dc
  FROM (VALUES (-1), (0), (1)) t1(dr), (VALUES (-1), (0), (1)) t2(dc)),
 d0 AS (
  SELECT gr, gc, CASE WHEN z > 50 THEN CAST(0 AS DOUBLE) END d
  FROM {_PX} WHERE z IS NOT NULL),{",".join(_dist_sweep_sql(f"d{k}", f"d{k + 1}") for k in range(4))}
SELECT CAST(coalesce(d, -1) AS BIGINT) dist, CAST(count(*) AS BIGINT) n_cells
FROM d4 GROUP BY 1
""",
        "slope_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_slope.parquet')
""",
        "curvature_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_curvature.parquet')
""",
        "twi_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_twi.parquet')
""",
        "aspect_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_aspect.parquet')
""",
        "flow_dir_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_flowdir.parquet')
""",
        "fill_pits_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_fillpits.parquet')
""",
        "flow_acc_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_flowacc.parquet')
""",
        "basin_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_basins.parquet')
""",
        "basin_sizes": f"""
SELECT basin, n_cells
FROM read_parquet('{F}/witness_basin_sizes.parquet')
""",
        "fill_depressions_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_filldep.parquet')
""",
        "stream_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_streams.parquet')
""",
        "reproject_lcc": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_reproject_lcc.parquet')
""",
        "reproject_epsg_itm": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_reproject_epsg2157.parquet')
""",
        "flow_length_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_flowlen.parquet')
""",
                                "least_cost_path": f"""
SELECT step, gr, gc, dist
FROM read_parquet('{F}/witness_costpath.parquet')
""",
"cost_distance": f"""
SELECT image_id, n_reached, sum_dist, max_dist
FROM read_parquet('{F}/witness_costdist.parquet')
""",
"viewshed_coverage": f"""
SELECT obs_id, n_cells, n_visible, sum_vis_z
FROM read_parquet('{F}/witness_viewshed.parquet')
""",
"strahler_stats": f"""
SELECT image_id, n_px, n_valid, sum_z
FROM read_parquet('{F}/witness_strahler.parquet')
""",
        "media_audio_features": f"""
SELECT audio_id, rms, peak, zcr, dom_freq
FROM read_parquet('{F}/witness_media_audio.parquet')
""",
        "media_audio_features_wav": f"""
SELECT audio_id, rms, peak, zcr, dom_freq
FROM read_parquet('{F}/witness_media_audio_wav.parquet')
""",
        "media_audio_features_mulaw": f"""
SELECT audio_id, rms, peak, zcr, dom_freq
FROM read_parquet('{F}/witness_media_audio_mulaw.parquet')
""",
        "media_frame_sample": f"""
SELECT video_id, frame_idx, mean, std
FROM read_parquet('{F}/witness_media_frames.parquet')
""",
        "media_frame_sample_avi": f"""
SELECT video_id, frame_idx, mean, std
FROM read_parquet('{F}/witness_media_frames_avi.parquet')
""",
        "augment_checks": f"""
SELECT op, image_id, n_valid, chk
FROM read_parquet('{F}/witness_augment.parquet')
""",
        "media_frame_motion": f"""
SELECT video_id, frame_idx, sad, cut
FROM read_parquet('{F}/witness_media_motion.parquet')
""",
        "media_image_features": f"""
SELECT image_id, mean, std, p_low, p_high, edge_energy
FROM read_parquet('{F}/witness_media_image.parquet')
""",
        "media_image_features_jpeg": f"""
SELECT image_id, mean, std, p_low, p_high, edge_energy
FROM read_parquet('{F}/witness_media_image_jpeg.parquet')
""",
        "media_image_features_gif": f"""
SELECT image_id, mean, std, p_low, p_high, edge_energy
FROM read_parquet('{F}/witness_media_image_gif.parquet')
""",
        "media_image_features_tiff": f"""
SELECT image_id, mean, std, p_low, p_high, edge_energy
FROM read_parquet('{F}/witness_media_image_tiff.parquet')
""",
        "media_image_features_pnm": f"""
SELECT image_id, mean, std, p_low, p_high, edge_energy
FROM read_parquet('{F}/witness_media_image_pnm.parquet')
""",
        "media_audio_spectral": f"""
SELECT audio_id, n_frames, centroid_mean, low_frac, mid_frac, high_frac,
       rolloff85
FROM read_parquet('{F}/witness_media_audio_spectral.parquet')
""",
        "vectorize": f"""
SELECT component_id, value, n_cells, min_gr, max_gr, min_gc, max_gc
FROM read_parquet('{F}/witness_vectorize.parquet')
""",
        "vectorize_rings": f"""
SELECT component_id, value, n_cells, ring_idx, n_vertices, area_cells
FROM read_parquet('{F}/witness_vectorize_rings.parquet')
""",
        "doc_minhash_near_dups": f"""
SELECT doc_id, group_id FROM read_parquet('{F}/witness_minhash_groups.parquet')
""",
        "doc_simhash": f"""
SELECT doc_id, simhash FROM read_parquet('{F}/witness_simhash.parquet')
""",
        "doc_fingerprint": f"""
SELECT doc_id, fingerprint FROM read_parquet('{F}/witness_fingerprint.parquet')
""",
        "doc_ngram_dedup": f"""
SELECT doc_id, total_windows, dup_windows
FROM read_parquet('{F}/witness_ngram_dup.parquet')
""",
        "ann_ivf_topk": f"""
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) rank
FROM read_parquet('{F}/witness_ivf_topk.parquet')
""",
        "emb_near_dups": f"""
SELECT vec_id, group_id FROM read_parquet('{F}/witness_emb_near_dups.parquet')
""",
        "ann_ivf_train": f"""
SELECT centroid, n FROM read_parquet('{F}/witness_ivf_train.parquet')
""",
        "ann_ivf_topk_p2": f"""
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) rank
FROM read_parquet('{F}/witness_ivf_topk_p2.parquet')
""",
        # TPC-H Q2 analog: min observed unit price per qualifying part
        # among region-local suppliers; cost is exact int64 cents so the
        # correlated min and its ties are integer equality both sides
        "min_cost_supplier": """
WITH sl AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'),
 pq AS (SELECT p_partkey FROM part
        WHERE p_size = 15),
 pairs AS (
  SELECT l.l_partkey pk, l.l_suppkey sk,
         min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) cents
  FROM lineitem l
  JOIN pq ON pq.p_partkey = l.l_partkey
  JOIN sl ON sl.s_suppkey = l.l_suppkey
  GROUP BY 1, 2),
 mn AS (SELECT pk, min(cents) mc FROM pairs GROUP BY pk)
SELECT CAST(p.pk AS BIGINT) p_partkey, CAST(p.sk AS BIGINT) s_suppkey,
       sl.s_name, sl.n_name, sl.s_acctbal,
       CAST(p.cents AS DOUBLE) / 100.0 min_cost
FROM pairs p
JOIN mn ON mn.pk = p.pk AND mn.mc = p.cents
JOIN sl ON sl.s_suppkey = p.sk
ORDER BY p_partkey, s_suppkey
""",
        # TPC-H Q11 analog: parts above a fixed per-mille of one nation's
        # total supplied value; the HAVING is the exact integer test
        # 1000*value > permille*total on both sides
        "important_part_value": """
WITH ns AS (
  SELECT s_suppkey FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'),
 pv AS (
  SELECT l.l_partkey pk,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) cents
  FROM lineitem l JOIN ns ON ns.s_suppkey = l.l_suppkey
  GROUP BY 1)
SELECT CAST(pk AS BIGINT) p_partkey, CAST(cents AS DOUBLE) / 100.0 AS "value"
FROM pv
WHERE 1000 * cents > 1 * (SELECT sum(cents) FROM pv)
ORDER BY value DESC
""",
        # TPC-H Q20 analog: one nation's suppliers that shipped more than
        # half of some prefix-named part's total ship-year quantity;
        # dominance is the exact integer test 2*pair_qty > part_total
        "dominant_part_suppliers": """
WITH pq AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small %'),
 pairs AS (
  SELECT l.l_partkey pk, l.l_suppkey sk,
         sum(CAST(round(l.l_quantity) AS BIGINT)) qty
  FROM lineitem l JOIN pq ON pq.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2),
 tot AS (SELECT pk, sum(qty) t FROM pairs GROUP BY pk),
 dom AS (
  SELECT DISTINCT p.sk FROM pairs p JOIN tot ON tot.pk = p.pk
  WHERE 2 * p.qty > tot.t)
SELECT CAST(s.s_suppkey AS BIGINT) s_suppkey, s.s_name
FROM dom JOIN supplier s ON s.s_suppkey = dom.sk
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_9'
ORDER BY s_suppkey
""",
    }
