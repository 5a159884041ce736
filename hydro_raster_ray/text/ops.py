"""Training-data text operators over the ``documents`` table.

The large-scale data-pipeline companions of the tile engine (the prompt's
first-class additions beyond the reference's own operators): exact dedup,
token counting, quality scoring, language ID, n-gram Jaccard similarity,
MinHash-LSH near-dup detection, SimHash, and rolling-hash fingerprints.

All hot paths are ``map_batches`` with vectorized pandas/numpy bodies or
C-speed ``hashlib``; wide steps pre-aggregate per batch before the groupby
(partial/combiner). Everything is deterministic: hashes are md5/blake2b
(never Python's salted ``hash``), so retries, resumes, and the DuckDB
oracles agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

__all__ = [
    "read_documents",
    "exact_dedup",
    "token_stats",
    "quality_scores",
    "quality_by_source",
    "lang_id",
    "jaccard_to_query",
    "minhash_near_dups",
    "simhash_docs",
    "fingerprint_docs",
    "ngram_dup_stats",
    "repetition_stats",
    "pack_chunks",
    "rarity_scores",
    "lm_surprisal_scores",
    "dedup_filter",
    "lang_confusion",
    "token_cms",
    "cms_estimate",
    "decontaminate",
    "cooccurrence_topk",
    "len_quantiles_by_lang",
    "pii_scrub",
    "stratified_sample",
    "url_domains",
    "heavy_hitters",
    "tfidf_top_terms",
    "bm25_topk",
]

_TOKEN_RE = re.compile(r"\S+")
# tiny fixed stopword list shared with the SQL oracle (keep in sync!)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "data", "value", "key")

# per-language marker words for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "a"},
    "fr": {"le", "la", "et", "de", "un", "est"},
    "es": {"el", "la", "y", "de", "un", "es"},
    "de": {"der", "die", "und", "von", "ein", "ist"},
    "zh": {"的", "是", "了", "在", "和", "有"},
}


def read_documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _md5_col(texts: pd.Series) -> pd.Series:
    # deliberately per-row C hashlib, NOT hashvec.md5_hex: for ~1 KB docs
    # the C digest is ~70× faster than the lane-vectorized numpy MD5
    # (measured round 4 — MD5 is sequential per message, so vectorizing
    # across lanes buys nothing once messages span multiple blocks); the
    # Python call overhead is ~0.5 µs/doc vs ~2.5 µs of C hashing
    return texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact duplicate groups by md5(text): hash-partition on the digest,
    keep the smallest doc_id per group. Columns: h, keep_id, n."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": _md5_col(df["text"]), "doc_id": df["doc_id"]})

    return (
        ds.map_batches(digest, batch_format="pandas", batch_size=512)
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n"))
    )


# BPE-ish subword pre-tokenizer: letter runs, digit runs, single
# punctuation marks — the shape GPT-style byte-pair pretokenization
# produces before merges. Kept in sync with the SQL oracle's
# regexp_extract_all pattern.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
BPE_PATTERN_SQL = "[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]"


def token_stats(sf_dir: str) -> "ray.data.Dataset":
    """Token counts per language: n_docs, whitespace tokens, BPE-ish
    subword tokens, n_chars. Pre-aggregated per batch; the groupby moves
    one row per (batch, lang)."""
    ds = read_documents(sf_dir, columns=["lang", "text", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            n_tokens=df["text"].str.count(_TOKEN_RE),
            n_bpe=df["text"].str.count(_BPE_RE),
        )
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("lang", "size"),
            n_tokens=("n_tokens", "sum"),
            n_bpe=("n_bpe", "sum"),
            n_chars=("n_chars", "sum"),
        )
        return g

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=512)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_bpe", alias_name="n_bpe"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )


def _doc_quality(df: pd.DataFrame) -> pd.DataFrame:
    # vectorized via one token explosion + grouped reductions (no per-doc
    # Python loops): same per-doc values as the scalar definition
    df = df.reset_index(drop=True)
    toks = df["text"].str.split()
    idx = pd.RangeIndex(len(df))
    toks.index = idx
    ex = toks.explode().dropna()
    wc = ex.groupby(level=0).size().reindex(idx, fill_value=0).astype(np.int64)
    stop = (
        ex.isin(STOPWORDS).groupby(level=0).sum().reindex(idx, fill_value=0)
    ).astype(np.int64)
    uniq = ex.groupby(level=0).nunique().reindex(idx, fill_value=0).astype(np.int64)
    mean_len = (
        ex.str.len().groupby(level=0).sum().reindex(idx, fill_value=0)
        / np.maximum(wc, 1)
    )
    score = (
        0.4 * np.minimum(wc / 100.0, 1.0)
        + 0.3 * (1.0 - stop / np.maximum(wc, 1))
        + 0.3 * (uniq / np.maximum(wc, 1))
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "source": df["source"],
            "wc": wc,
            "stop_n": stop.astype(np.int64),
            "uniq_n": uniq.astype(np.int64),
            "mean_word_len": mean_len,
            "quality": score,
        }
    )


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    """Per-document quality features (length / stopword / uniqueness mix)."""
    ds = read_documents(sf_dir, columns=["doc_id", "source", "text"])
    return ds.map_batches(_doc_quality, batch_format="pandas", batch_size=256)


def quality_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Mean quality per source, 4-decimal rounded (stable for value-hash
    comparison against the SQL oracle)."""
    scored = quality_scores(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False).agg(
            n=("quality", "size"), q_sum=("quality", "sum")
        )

    agg = (
        scored.map_batches(partial, batch_format="pandas", batch_size=256)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("q_sum", alias_name="q_sum"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "source": df["source"],
                "n": df["n"].astype(np.int64),
                "avg_quality": (df["q_sum"] / df["n"]).round(4),
            }
        )
        return out

    return agg.map_batches(final, batch_format="pandas")


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    """Marker-word language heuristic: argmax language by marker hits, tie →
    'und'. Columns: doc_id, pred_lang, lang (truth for accuracy eval)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text", "lang"])
    markers = {k: frozenset(v) for k, v in LANG_MARKERS.items()}

    def predict(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized: one token explosion, one isin per language, grouped
        # sums; argmax with strict-winner tie rule ('und' on ties/zero)
        df = df.reset_index(drop=True)
        idx = pd.RangeIndex(len(df))
        ex = df["text"].str.lower().str.split().explode().dropna()
        hits = np.zeros((len(df), len(markers)), dtype=np.int64)
        codes = list(markers)
        for j, code in enumerate(codes):
            h = ex.isin(markers[code]).groupby(level=0).sum()
            hits[h.index.to_numpy(), j] = h.to_numpy()
        srt = np.sort(hits, axis=1)
        top = srt[:, -1]
        second = srt[:, -2] if len(codes) > 1 else np.zeros(len(df), dtype=np.int64)
        # strict winner rule of the scalar definition: a unique positive
        # maximum names the language, ties/zero → 'und'
        best_j = np.argmax(hits, axis=1)
        pred = np.where(
            (top > 0) & (second < top), np.array(codes, dtype=object)[best_j], "und"
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": pred, "lang": df["lang"]}
        )

    return ds.map_batches(predict, batch_format="pandas", batch_size=256)


def _shingle_hashes_batch(toks: "pd.Series", n: int = 3) -> list[np.ndarray]:
    """Per doc: sorted unique uint64 hashes of the word n-shingles — the
    shared base representation for MinHash signatures AND exact-Jaccard
    verification (64-bit collisions are negligible and deterministic).

    A shingle's hash is the polynomial combine of its n TOKEN hashes
    (``Σ h(tok_i)·B^(n-1-i) mod 2^64``, blake2b-8 token hashes): tokens are
    hashed ONCE per unique token per batch (``_token_hashes``) and windows
    are pure numpy strided products — no per-shingle string building or
    per-shingle hashlib call (the round-2 formulation built and hashed a
    Python string per shingle per doc; docs shorter than ``n`` combine all
    their tokens). The witness reproduces the identical arithmetic with
    Python ints."""
    from numpy.lib.stride_tricks import sliding_window_view

    h, lens = _token_hashes(toks)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    pows = _FP_BASE ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    out: list[np.ndarray] = []
    for i in range(len(toks)):
        hd = h[bounds[i] : bounds[i + 1]]
        if hd.size == 0:
            out.append(np.empty(0, dtype=np.uint64))
        elif hd.size < n:
            p = _FP_BASE ** np.arange(hd.size - 1, -1, -1, dtype=np.uint64)
            out.append(np.array([(hd * p).sum(dtype=np.uint64)], dtype=np.uint64))
        else:
            wins = sliding_window_view(hd, n)
            out.append(
                np.unique((wins * pows[None, :]).sum(axis=1, dtype=np.uint64))
            )
    return out


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Single-doc convenience wrapper over ``_shingle_hashes_batch``."""
    return _shingle_hashes_batch(pd.Series([text.split()]), n)[0]


def _token_hashes(tokens: "pd.Series") -> tuple[np.ndarray, np.ndarray]:
    """Hash every token of a batch ONCE per unique token (batched blake2b —
    the fix for the round-1 per-token-per-doc hashlib loops). Returns
    (flat uint64 hashes in doc order, per-doc token counts)."""
    lens = np.fromiter((len(ws) for ws in tokens), dtype=np.int64, count=len(tokens))
    flat = np.array([w for ws in tokens for w in ws], dtype=object)
    if flat.size == 0:
        return np.empty(0, dtype=np.uint64), lens
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(), "little")
            for u in uniq
        ),
        dtype=np.uint64,
        count=uniq.size,
    )
    return uh[inv], lens


def jaccard_to_query(sf_dir: str, query_doc_id: int = 0, n: int = 3,
                     top_k: int = 20) -> "ray.data.Dataset":
    """n-gram (word 3-shingle) Jaccard similarity of every document against
    one query document, top-k. The query doc's shingle set is the broadcast
    small side. Columns: doc_id, sim (4-dec)."""
    import duckdb

    q_text = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE doc_id = {int(query_doc_id)}"
    ).fetchone()[0]
    q_hs = np.unique(_shingle_hashes(q_text, n))
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def _prune(ids: np.ndarray, sims: np.ndarray) -> pd.DataFrame:
        # sort unconditionally so the final merge emits (sim desc, doc_id)
        # order even with ≤ top_k candidates; merge input is k·n_blocks rows
        top = np.lexsort((ids, -sims))[:top_k]
        return pd.DataFrame({"doc_id": ids[top], "sim": sims[top]})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # hashed-shingle Jaccard, no per-row Python set building: per-doc
        # UNIQUE shingle hashes (``_shingle_hashes_batch``), one flat
        # ``np.isin`` against the broadcast query array, per-doc
        # intersection counts via cumsum differencing (reduceat mishandles
        # empty segments). Set sizes on 64-bit hashes equal set sizes on
        # the shingle strings absent a hash collision (~2^-64 per pair),
        # so sims match the string-shingle oracle bit-for-bit.
        hs_list = _shingle_hashes_batch(df["text"].str.split(), n)
        counts = np.fromiter((h.size for h in hs_list), np.int64, len(hs_list))
        bounds = np.concatenate([[0], np.cumsum(counts)])
        if bounds[-1]:
            member = np.isin(np.concatenate(hs_list), q_hs)
            cm = np.concatenate([[0], np.cumsum(member)])
            inter = cm[bounds[1:]] - cm[bounds[:-1]]
        else:
            inter = np.zeros(len(hs_list), np.int64)
        union = counts + q_hs.size - inter
        sims = np.divide(inter, union, out=np.zeros(len(hs_list)),
                         where=union > 0)
        # per-batch partial top-k: only top_k rows leave each task — a
        # global sort().limit(k) would range-shuffle the whole corpus for
        # a k-row answer (ties break on doc_id, same as the SQL ORDER BY)
        return _prune(df["doc_id"].to_numpy(np.int64), np.round(sims, 4))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return _prune(
            df["doc_id"].to_numpy(np.int64), df["sim"].to_numpy(np.float64)
        )

    cand = ds.map_batches(score, batch_format="pandas", batch_size=256)
    return cand.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def _minhash_matrix(texts: pd.Series, num_perm: int, n: int) -> np.ndarray:
    """(len, num_perm) uint64 MinHash signatures over word n-shingles.

    Permutations are the classic (a*h + b) mod p family with fixed
    deterministic a, b; the base shingle hash is blake2b-8 (stable)."""
    p = (1 << 61) - 1
    rng = np.arange(1, num_perm + 1, dtype=np.uint64)
    a = (rng * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)) % np.uint64(p)
    b = (rng * np.uint64(0xC2B2AE3D27D4EB4F)) % np.uint64(p)
    out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, hs in enumerate(_shingle_hashes_batch(texts.str.split(), n)):
        if hs.size == 0:
            continue
        hp = hs % np.uint64(p)
        # (a*h + b) mod p, vectorized over perms × shingles
        sig = (a[:, None] * hp[None, :] + b[:, None]) % np.uint64(p)
        out[i] = sig.min(axis=1)
    return out


def minhash_near_dups(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    num_partitions: int | None = None,
    broadcast_budget: int = 2_000_000,
    bucket_broadcast_budget: int = 4_000_000,
    endpoint_broadcast_budget: int = 200_000,
) -> "ray.data.Dataset":
    """MinHash + LSH near-duplicate CLUSTERS, exact-Jaccard verified.

    Output columns: ``doc_id``, ``group_id`` (= min doc_id of the verified
    cluster) — one row per document that belongs to a near-dup cluster of
    size ≥ 2, sorted by doc_id.

    Scale design (replaces the round-1 O(n²)-pairs + driver-verify path):

    - Each LSH bucket emits **star edges** (bucket-min ↔ member): O(bucket)
      rows, so a degenerate bucket (the same boilerplate repeated 10⁶
      times — the common web-corpus case) emits 10⁶ edges, not 5·10¹¹
      pairs. No driver-side cap needed; the emission is linear.
    - Candidate edges are verified **distributed**: two Ray Data hash joins
      attach each endpoint's hashed-shingle set (uint64 array packed to a
      binary column — Arrow hash joins don't carry list payloads), then
      exact Jaccard per edge inside ``map_batches``. When the candidate id
      set fits ``broadcast_budget`` the document side is pre-pruned with
      ``pc.is_in`` before shingling (broadcast fast path); otherwise the
      full corpus flows through the inner join — one bounded all-to-all,
      and the join itself performs the semi-join pruning.
    - Verified edges are grouped by **distributed connected components**
      (``stages/cc.py``: min-label propagation + pointer jumping) — no
      driver union-find, no candidate texts on the driver.

    Semantics: near-dup candidacy is per star edge (member vs bucket min);
    a pair that never shares a bucket containing their common min is linked
    transitively or not at all — the standard scalable contract. The
    single-process witness (``text/witness.py``) implements the identical
    contract, so the driver oracle is exact.
    """
    import pyarrow.compute as pc

    from ..stages.cc import (
        auto_join_partitions,
        auto_shuffle_blocks,
        connected_components,
    )

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    rows_per_band = num_perm // bands
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())}
    )

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        from ..hashvec import mix64_rows

        sigs = _minhash_matrix(df["text"], num_perm, n)
        band_ids = np.repeat(np.arange(bands), len(df))
        doc_ids = np.tile(df["doc_id"].to_numpy(), bands)
        # band hash = splitmix64-chained mix over the band's signature
        # slice, one vectorized call for ALL (doc, band) rows — the former
        # per-(doc,band) hashlib.blake2b loop was the only Python-rate
        # loop in the scaling-headline stage (docs×bands interpreter calls)
        hashes = mix64_rows(
            sigs.reshape(len(df), bands, rows_per_band)
            .transpose(1, 0, 2)
            .reshape(bands * len(df), rows_per_band)
        )
        return pd.DataFrame(
            {
                "band": band_ids.astype(np.int32),
                "band_hash": hashes.astype(np.int64),
                "doc_id": doc_ids,
            }
        )

    # star edges per LSH bucket, fully VECTORIZED: bucket minima via one
    # aggregate, then a hash join attaches each row's bucket-min — a
    # map_groups(bucket_star) formulation pays one Python UDF call per
    # distinct (band, band_hash) key (~docs×bands calls; measured 13 s of
    # pure per-key overhead at 5k docs where the same work as a join takes
    # ~2 s). Joins keyed on band_hash are empty-partition-safe (high-
    # cardinality keys), unlike label-keyed joins (stages/cc.py notes).
    from ..stages.cc import coerce_schema

    _SIG_SCHEMA = pa.schema(
        [("band", pa.int32()), ("band_hash", pa.int64()), ("doc_id", pa.int64())]
    )
    sig = coerce_schema(
        ds.map_batches(sig_rows, batch_format="pandas", batch_size=128)
        # coalesce before the shuffle: sort-shuffle cost grows with block
        # count and the sig stage emits many small blocks; width sized to
        # the cluster, never a fixed constant
        .repartition(auto_shuffle_blocks()),
        _SIG_SCHEMA,
    ).materialize()  # read twice: bucket minima + the join probe side
    mins = coerce_schema(
        sig.groupby(["band", "band_hash"]).aggregate(Min("doc_id", alias_name="a")),
        pa.schema(
            [("band", pa.int32()), ("band_hash", pa.int64()), ("a", pa.int64())]
        ),
    )
    # bucket-min attach: broadcast fast path vs shuffle join. The mins table
    # has ≤ sig-rows entries (~24 B each), so when the SIGNATURE table is
    # under the budget the whole bucket-min side ships once via ``ray.put``
    # (per-band sorted hash→min arrays) and star edges are emitted in the
    # same map that reads the signatures — no sig×mins exchange at all.
    # Gating on sig rows (known O(1) from the materialized ds) rather than
    # on ``mins.count()`` keeps the at-scale path streaming: the fallback
    # join never materializes mins. Measured: the join formulation costs
    # ~3 s of fixed exchange overhead at sf0.1 that the broadcast removes.
    if sig.count() <= bucket_broadcast_budget:
        parts = [
            b
            for b in mins.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        ]
        mb = np.concatenate([p["band"].to_numpy() for p in parts])
        mh = np.concatenate([p["band_hash"].to_numpy() for p in parts])
        ma = np.concatenate([p["a"].to_numpy() for p in parts])
        per_band = []
        for bd in range(bands):
            sel = mb == bd
            hh = mh[sel]
            o = np.argsort(hh, kind="stable")
            per_band.append((hh[o], ma[sel][o]))
        bref = ray.put(per_band)

        def star_bcast(t: pa.Table) -> pa.Table:
            pb = ray.get(bref)
            bnd = t["band"].to_numpy()
            hsh = t["band_hash"].to_numpy()
            did = t["doc_id"].to_numpy()
            avals = np.empty(t.num_rows, np.int64)
            # every sig row's bucket is present in mins (mins derives from
            # sig), so the searchsorted lookup always hits exactly
            for bd in np.unique(bnd):
                m = bnd == bd
                hs, aa = pb[int(bd)]
                avals[m] = aa[np.searchsorted(hs, hsh[m])]
            keep = did != avals
            return pa.table(
                {
                    "a": pa.array(avals[keep], pa.int64()),
                    "b": pa.array(did[keep], pa.int64()),
                }
            )

        starred = sig.map_batches(star_bcast, batch_format="pyarrow")
    else:
        joined = sig.join(mins, "inner", num_partitions, on=("band", "band_hash"))

        def star(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            keep = _pc.not_equal(t["doc_id"], t["a"])
            kept = t.filter(keep)
            return pa.table(
                {
                    "a": kept["a"].combine_chunks().cast(pa.int64()),
                    "b": kept["doc_id"].combine_chunks().cast(pa.int64()),
                }
            )

        starred = joined.map_batches(star, batch_format="pyarrow")

    edges = (
        starred.groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
        .materialize()  # bounded: O(candidate edges); reused twice below
    )
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(empty)

    docs = ds
    use_csr = False
    if n_edges <= broadcast_budget:
        # broadcast fast path: distinct endpoints collected straight off the
        # (already materialized, bounded) edge table — one pass, no extra
        # distinct shuffle
        ids_np = np.unique(
            np.concatenate(
                [
                    np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()])
                    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow")
                    if b.num_rows
                ]
            )
        )
        ref = ray.put(ids_np)

        def filt(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["doc_id"], value_set=pa.array(ray.get(ref))))

        docs = ds.map_batches(filt, batch_format="pyarrow")
        # second-tier fast path: when the ENDPOINT set is small enough that
        # its shingle sets fit the object store comfortably (~KBs per doc),
        # verify by broadcast CSR lookup instead of two attach joins — the
        # joins cost ~4 s of fixed exchange overhead at sf0.1 for a
        # few-hundred-row edge table
        use_csr = ids_np.size <= endpoint_broadcast_budget

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        packs = [a.tobytes() for a in _shingle_hashes_batch(df["text"].str.split(), n)]
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "sh": packs}
        )

    from ..stages.cc import rename_cols

    docs_sh = docs.map_batches(shingle_rows, batch_format="pandas", batch_size=128)

    def _jacc_keep(a_ids, b_ids, ha_list, hb_list):
        ka, kb = [], []
        for a, b, ha, hb in zip(a_ids, b_ids, ha_list, hb_list):
            inter = np.intersect1d(ha, hb, assume_unique=True).size
            union = ha.size + hb.size - inter
            if union and inter / union >= jaccard_threshold:
                ka.append(a)
                kb.append(b)
        return pd.DataFrame(
            {"a": np.asarray(ka, dtype=np.int64), "b": np.asarray(kb, dtype=np.int64)}
        )

    if use_csr:
        # gather the (bounded) endpoint shingle sets once: CSR pack of
        # sorted doc_ids → offsets → concatenated uint64 hash values
        gid, gbytes = [], []
        for b in docs_sh.iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows:
                gid.append(b["doc_id"].to_numpy())
                gbytes.extend(b["sh"].to_pylist())
        gid = np.concatenate(gid)
        lens = np.fromiter((len(x) // 8 for x in gbytes), np.int64, count=len(gbytes))
        vals = np.frombuffer(b"".join(gbytes), dtype=np.uint64)
        o = np.argsort(gid, kind="stable")
        starts = np.concatenate([[0], np.cumsum(lens)])
        order_off = starts[o]
        order_len = lens[o]
        sorted_vals = np.concatenate(
            [vals[order_off[i] : order_off[i] + order_len[i]] for i in range(o.size)]
        ) if o.size else vals
        csr_ref = ray.put(
            (gid[o], np.concatenate([[0], np.cumsum(order_len)]), sorted_vals)
        )

        def verify_csr(t: pa.Table) -> pd.DataFrame:
            ids_s, off, vv = ray.get(csr_ref)
            a_ids = t["a"].to_numpy()
            b_ids = t["b"].to_numpy()
            ia = np.searchsorted(ids_s, a_ids)
            ib = np.searchsorted(ids_s, b_ids)
            return _jacc_keep(
                a_ids,
                b_ids,
                [vv[off[i] : off[i + 1]] for i in ia],
                [vv[off[i] : off[i + 1]] for i in ib],
            )

        ok_edges = edges.map_batches(verify_csr, batch_format="pyarrow")
    else:
        e2 = rename_cols(
            rename_cols(
                edges.join(
                    docs_sh, "inner", num_partitions, on=("a",), right_on=("doc_id",)
                ),
                {"sh": "sh_a"},
            ).join(docs_sh, "inner", num_partitions, on=("b",), right_on=("doc_id",)),
            {"sh": "sh_b"},
        )

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            return _jacc_keep(
                df["a"],
                df["b"],
                [np.frombuffer(x, dtype=np.uint64) for x in df["sh_a"]],
                [np.frombuffer(x, dtype=np.uint64) for x in df["sh_b"]],
            )

        ok_edges = e2.map_batches(verify, batch_format="pandas")
    labels = connected_components(ok_edges, num_partitions=num_partitions)
    if labels.count() == 0:
        return ray.data.from_arrow(empty)
    return rename_cols(labels, {"node": "doc_id", "label": "group_id"}).sort("doc_id")


def simhash_docs(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash per document over whitespace tokens (blake2b token
    hashes, unweighted). Columns: doc_id, simhash (int64).

    Batched: each batch hashes every UNIQUE token once (``_token_hashes``),
    builds the (n_tokens × 64) ±1 bit-contribution matrix in one shot, and
    reduces per document with ``np.add.reduceat`` — no per-doc-per-token
    Python/hashlib loop (the round-1 formulation was ~100× slower).
    Output is bit-identical to the scalar definition: bit k set iff the
    sum of ±1 contributions of bit k over the doc's tokens is > 0."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    shifts = np.arange(64, dtype=np.uint64)

    def sim(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        h, lens = _token_hashes(toks)
        out = np.zeros(len(df), dtype=np.int64)
        nz = np.nonzero(lens)[0]
        if nz.size:
            contrib = (
                ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
            )
            bounds = np.concatenate([[0], np.cumsum(lens)])[nz]
            acc = np.add.reduceat(contrib, bounds, axis=0)  # (n_nonempty, 64)
            vals = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[nz] = vals.astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})

    return ds.map_batches(sim, batch_format="pandas", batch_size=256)


# polynomial rolling-hash base for window fingerprints (odd → invertible
# mod 2^64; fixed so retries/oracles agree)
_FP_BASE = np.uint64(0x100000001B3)  # FNV-1a prime


def fingerprint_docs(sf_dir: str, window: int = 8) -> "ray.data.Dataset":
    """Winnowing-style document fingerprint: minimum window hash per doc.

    Window hash = polynomial combine of the window's blake2b-8 token hashes
    in uint64 arithmetic: ``H(w) = Σ h_i · B^(len-1-i)  (mod 2^64)`` — a
    vectorized mixing hash instead of the round-1 per-window string join +
    blake2b (tokens are hashed once per unique token per batch; windows are
    pure numpy strided products). Docs shorter than ``window`` hash their
    full token list. Columns: doc_id, fingerprint (int64)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        from numpy.lib.stride_tricks import sliding_window_view

        toks = df["text"].str.split()
        h, lens = _token_hashes(toks)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        pows = _FP_BASE ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        out = np.zeros(len(df), dtype=np.int64)
        for i in range(len(df)):
            hd = h[bounds[i] : bounds[i + 1]]
            if hd.size == 0:
                # empty doc: fingerprint of the empty window is 0
                continue
            if hd.size < window:
                p = _FP_BASE ** np.arange(hd.size - 1, -1, -1, dtype=np.uint64)
                m = (hd * p).sum(dtype=np.uint64)
            else:
                wins = sliding_window_view(hd, window)
                m = (wins * pows[None, :]).sum(axis=1, dtype=np.uint64).min()
            out[i] = np.int64(m.astype(np.int64))
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": out})

    return ds.map_batches(fp, batch_format="pandas", batch_size=256)


def ngram_dup_stats(
    sf_dir: str, window: int = 8, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """Exact duplicated-n-gram detection — the window-granular form of exact
    substring dedup (the "dedup by duplicated 50-token spans" family; the
    reference has no text operators, this is a first-class training-data
    addition like ``minhash_near_dups``).

    A ``window``-token window is DUPLICATED when its hash occurs in ≥ 2
    distinct documents. Window hashes are ``_shingle_hashes_batch``'s
    polynomial-combine arithmetic with n=window (per-doc UNIQUE, so a
    window's group count IS its distinct-doc count); docs shorter than
    ``window`` contribute their full token list as one window, and zero-token
    docs have no windows and are excluded (contract mirrored by the witness).

    Topology (all distributed; the groupby on window hashes is the inherent
    all-to-all of the operator): doc→(win, doc_id) pairs → groupby(win)
    count → hash-join counts back onto the pairs (co-partitioned on the
    same key; inner join is total because counts derive from the pairs) →
    per-batch partial per-doc sums → final groupby(doc_id).

    Columns: doc_id, total_windows, dup_windows (int64).
    """
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def pairs_fn(df: pd.DataFrame) -> pa.Table:
        hs = _shingle_hashes_batch(df["text"].str.split(), window)
        dids = df["doc_id"].to_numpy()
        lens = np.fromiter((h.size for h in hs), dtype=np.int64, count=len(hs))
        if lens.sum() == 0:
            return pa.table(
                {"win": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        win = np.concatenate([h for h in hs if h.size]).view(np.int64)
        return pa.table(
            {
                "win": pa.array(win, pa.int64()),
                "doc_id": pa.array(np.repeat(dids, lens), pa.int64()),
            }
        )

    # consumed twice (count side + join probe side): deliberately NOT
    # materialized — the tokenize+hash recompute is cheap and the two
    # consumers pipeline it concurrently, whereas a materialize barrier
    # serializes the plan (measured slower at sf0.1: 14.9 s vs 8.2 s warm)
    pairs = ds.map_batches(pairs_fn, batch_format="pandas")
    counts = (
        pairs.map_batches(
            lambda t: t.select(["win"]).rename_columns(["win_r"]),
            batch_format="pyarrow",
        )
        .groupby("win_r")
        .aggregate(Count(alias_name="n_docs"))
    )
    j = pairs.join(counts, "inner", num_partitions, on=("win",), right_on=("win_r",))

    def partial(t: pa.Table) -> pa.Table:
        # per-batch per-doc partial sums, emitted as ARROW blocks: Ray's
        # sort-based aggregate is ~10× slower shuffling pandas blocks than
        # Arrow blocks (measured 18.4 s vs 1.8 s on this exact table), and
        # join outputs otherwise propagate the pandas format downstream
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        dup = (t["n_docs"].to_numpy(zero_copy_only=False) >= 2).astype(np.int64)
        uniq, inv = np.unique(doc, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "total_windows": pa.array(np.bincount(inv), pa.int64()),
                "dup_windows": pa.array(
                    np.bincount(inv, weights=dup).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("total_windows", alias_name="total_windows"),
            Sum("dup_windows", alias_name="dup_windows"),
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["total_windows"] = df["total_windows"].astype(np.int64)
        df["dup_windows"] = df["dup_windows"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas")


# PII redaction regexes — simple enough that Python re and DuckDB RE2 agree
# on every span (no backrefs/lookaround; greedy quantifiers both engines)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"555-[0-9]{4}"


def pii_scrub(sf_dir: str) -> "ray.data.Dataset":
    """PII redaction stats per source — the training-data scrubbing stage.

    The fixture corpus contains no PII, so (like the depression-filling
    query's carve step) deterministic PII is INJECTED first, from doc_id
    arithmetic that the SQL oracle reproduces expression-for-expression:
    docs with ``doc_id % 7 == 0`` gain an email, ``doc_id % 11 == 0`` a
    phone number. The scrub counts matches of each pattern and replaces
    them with ``[EMAIL]`` / ``[PHONE]``; ``chars_removed`` is the length
    delta — sensitive to the exact match spans, so the oracle catches a
    regex-semantics divergence, not just a count. Vectorized pandas
    ``.str`` ops per batch, partial per-source aggregation, one small
    groupby."""
    docs = read_documents(sf_dir, columns=["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype(np.int64)
        t = df["text"]
        em_inj = ids % 7 == 0
        t = t.where(
            ~em_inj, t + " contact: user" + ids.astype(str) + "@example.com"
        )
        ph_inj = ids % 11 == 0
        t = t.where(~ph_inj, t + " call 555-" + (1000 + ids % 9000).astype(str))
        n_em = t.str.count(PII_EMAIL_RE)
        n_ph = t.str.count(PII_PHONE_RE)
        clean = t.str.replace(PII_EMAIL_RE, "[EMAIL]", regex=True).str.replace(
            PII_PHONE_RE, "[PHONE]", regex=True
        )
        removed = t.str.len() - clean.str.len()
        g = pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": 1,
                "n_emails": n_em.astype(np.int64),
                "n_phones": n_ph.astype(np.int64),
                "chars_removed": removed.astype(np.int64),
            }
        ).groupby("source", as_index=False).sum()
        return g

    agg = (
        docs.map_batches(partial, batch_format="pandas", batch_size=256)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_emails", alias_name="n_emails"),
            Sum("n_phones", alias_name="n_phones"),
            Sum("chars_removed", alias_name="chars_removed"),
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_docs", "n_emails", "n_phones", "chars_removed"):
            df[c] = df[c].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas")


def repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style within-document repetition filters (Rae et al. 2021
    repetition heuristics, public literature): duplicate-token fraction and
    top word-2-gram fraction, per document.

    Both fractions are emitted as exact ``floor(10000·frac)`` integers so
    the DuckDB oracle hash-matches without float-rounding hazards; the
    division/multiplication order mirrors the SQL expression exactly.
    Fully vectorized across the batch: tokens map to ids via one
    ``np.unique``, 2-grams are consecutive id pairs masked at document
    boundaries, and per-(doc, gram) counts reduce via one lexsort — no
    per-document Python. Columns: doc_id, n_toks, dup_tok_pm, top2_pm,
    flagged (dup > 0.70 or top-2-gram > 0.20)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.lower().str.split()
        n = len(df)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        n_dist = np.zeros(n, dtype=np.int64)
        top2 = np.zeros(n, dtype=np.int64)
        if flat.size:
            uniq, inv = np.unique(flat, return_inverse=True)
            u = np.int64(uniq.size)
            # distinct tokens per doc = unique (doc, token-id) pairs
            ks = np.unique(doc_of * u + inv)
            n_dist = np.bincount(ks // u, minlength=n)
            # word 2-grams: consecutive positions within the same doc;
            # identity by id pair (tokens contain no whitespace, so this
            # equals the SQL's space-joined string gram)
            m = doc_of[1:] == doc_of[:-1]
            if m.any():
                gdoc = doc_of[:-1][m]
                gkey = inv[:-1][m] * u + inv[1:][m]
                order = np.lexsort((gkey, gdoc))
                gd, gk = gdoc[order], gkey[order]
                starts = np.flatnonzero(
                    np.r_[True, (gd[1:] != gd[:-1]) | (gk[1:] != gk[:-1])]
                )
                cnt = np.diff(np.r_[starts, gd.size])
                np.maximum.at(top2, gd[starts], cnt)
        safe = np.maximum(lens, 1)
        dup_pm = np.floor(
            10000.0 * (1.0 - n_dist.astype(np.float64) / safe)
        ).astype(np.int64)
        dup_pm[lens == 0] = 0
        tot2 = np.maximum(lens - 1, 0)
        t2 = np.zeros(n, dtype=np.int64)
        nz = tot2 > 0
        t2[nz] = np.floor(
            (10000.0 * top2[nz].astype(np.float64)) / tot2[nz]
        ).astype(np.int64)
        flagged = ((dup_pm > 7000) | (t2 > 2000)).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_toks": lens,
                "dup_tok_pm": dup_pm,
                "top2_pm": t2,
                "flagged": flagged,
            }
        )

    return ds.map_batches(per_batch, batch_format="pandas", batch_size=512)


def stratified_sample(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """Deterministic stratified subsample: the k documents with the smallest
    ``(md5(doc_id), doc_id)`` key per language — the exact-quota sampling a
    training mix needs (reproducible, order-free, no RNG state).

    Distributed as per-batch partial top-k per stratum (at most k·n_langs
    rows leave each task) + one tiny single-block merge — the
    ``top_k_tiles`` pattern; no global sort. Hashing is the batch-
    vectorized MD5 (``hashvec.md5_hex`` — doc-id strings are single-block,
    the case where lane vectorization wins). Columns: doc_id, lang."""
    import pyarrow.compute as pc

    from ..hashvec import md5_hex

    ds = read_documents(sf_dir, columns=["doc_id", "lang"])

    def prune(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "lang": pa.array([], pa.string())}
            )
        hexes = md5_hex(pc.cast(batch["doc_id"], pa.string()))
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        order = np.lexsort((ids, hexes, langs))
        l_s = langs[order]
        new = np.r_[True, l_s[1:] != l_s[:-1]]
        rank = np.arange(l_s.size) - np.flatnonzero(new)[np.cumsum(new) - 1]
        keep = order[rank < k]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "lang": pa.array(langs[keep], pa.string()),
            }
        )

    cand = ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
    # ≤ k·n_langs rows per upstream block: one block, one merge call
    return cand.repartition(1).map_batches(
        prune, batch_format="pyarrow", batch_size=None
    )


def pack_chunks(sf_dir: str, seq_len: int = 256) -> "ray.data.Dataset":
    """GPT-style sequence packing (concat-then-chunk): concatenate every
    document's BPE-ish token stream in ``doc_id`` order and cut it into
    fixed ``seq_len`` chunks; per document report its token count and the
    chunk ids it lands in — the layout a pretraining loader needs to map
    corpus position back to provenance.

    The global offset is a distributed ordered prefix-sum (scan):

    1. bucket = contiguous ``doc_id`` range (cluster-sized bucket count);
    2. pass A: per-batch partial per-bucket token sums → one tiny groupby
       (n_buckets rows) → driver exclusive prefix over bucket totals —
       the only driver-side state is one number per bucket, broadcast;
    3. pass B: ``groupby(bucket).map_groups`` — sort the bucket's
       (doc_id, n_tokens) rows, local cumsum + the bucket's offset.

    The text column never shuffles (only the two-int token table does),
    and the regex tokenization runs once per pass rather than
    materializing a corpus-sized token table. Empty documents occupy
    their boundary chunk (``greatest(n,1)`` in the chunk-span arithmetic,
    mirrored in the SQL oracle). Columns: doc_id, n_tokens, first_chunk,
    last_chunk, n_chunks.
    """
    from ..stages.cc import auto_shuffle_blocks

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    max_id = int(
        read_documents(sf_dir, columns=["doc_id"]).max("doc_id") or 0
    )
    n_buckets = max(1, auto_shuffle_blocks())
    width = max(1, (max_id + n_buckets) // n_buckets)

    def tokens(df: pd.DataFrame) -> pa.Table:
        # Arrow out: this table feeds two groupbys (pandas blocks poison
        # Ray's sort shuffle — see ROUND4_NOTES "engine lesson")
        did = df["doc_id"].to_numpy(np.int64)
        n = df["text"].str.count(_BPE_RE).to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "bucket": pa.array(did // width, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    tok = ds.map_batches(tokens, batch_format="pandas", batch_size=512)

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False).agg(tot=("n_tokens", "sum"))

    totals = (
        tok.map_batches(bucket_partial, batch_format="pandas", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("tot", alias_name="tot"))
        .to_pandas()  # ≤ n_buckets rows
        .sort_values("bucket")
    )
    buckets = totals["bucket"].to_numpy(np.int64)
    offs = np.r_[
        np.zeros(1, np.int64), np.cumsum(totals["tot"].to_numpy(np.int64))[:-1]
    ]
    oref = ray.put((buckets, offs))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        b_arr, o_arr = _ray.get(oref)
        df = df.sort_values("doc_id")
        n = df["n_tokens"].to_numpy(np.int64)
        off0 = int(o_arr[np.searchsorted(b_arr, int(df["bucket"].iloc[0]))])
        start = off0 + np.r_[np.zeros(1, np.int64), np.cumsum(n)[:-1]]
        last_pos = start + np.maximum(n, 1) - 1
        first = start // seq_len
        last = last_pos // seq_len
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "first_chunk": first,
                "last_chunk": last,
                "n_chunks": last - first + 1,
            }
        )

    return tok.groupby("bucket").map_groups(scan, batch_format="pandas")


def rarity_scores(
    sf_dir: str, broadcast_budget: int = 5_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Corpus-level document-frequency (TF-IDF-shaped) rarity scoring: per
    document, the sum over its DISTINCT tokens of ``1_000_000 // df(tok)``
    where ``df`` is the token's document frequency across the corpus — the
    two-pass df-then-score join every TF-IDF / rare-token quality filter
    needs. Pure integer arithmetic (rational idf surrogate, no ``ln``), so
    the DuckDB oracle hash-matches with zero float hazards.

    Distributed shape:

    1. pass A: per-batch DISTINCT (doc, token) counts (documents never
       span batches, so within-batch distinct-doc counts are exact
       partials) → one ``groupby(tok).sum`` whose output is VOCABULARY-
       sized, not corpus-sized — the classic partial/combiner df build;
    2. under ``broadcast_budget`` rows the df table materializes on the
       driver and broadcasts once via ``ray.put`` (sorted token array +
       df array); ABOVE it (open-vocabulary corpora — typos/URLs push
       |vocab| past driver memory) the same pass-A output feeds a native
       hash join on ``tok`` (high-cardinality: join-safe) against the
       distinct (doc, tok) pair stream, with per-batch partial per-doc
       sums → ``groupby(doc_id)`` — nothing vocabulary-sized leaves the
       cluster;
    3. pass B (broadcast path): per-batch distinct tokens per doc →
       ``searchsorted`` into the broadcast vocab → integer score
       ``bincount``-summed per doc.

    Documents with zero tokens are omitted (the SQL unnest+GROUP BY drops
    them identically). Columns: doc_id, n_distinct, rarity_score."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def _distinct_pairs(df: pd.DataFrame):
        toks = df["text"].str.lower().str.split()
        n = len(df)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if not flat.size:
            return None
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        uniq, inv = np.unique(flat, return_inverse=True)
        pairs = np.unique(doc_of * np.int64(uniq.size) + inv)
        return uniq, pairs // uniq.size, pairs % uniq.size  # vocab, doc, tok

    def partial_df(df: pd.DataFrame) -> pa.Table:
        # Arrow out: this table feeds a groupby (pandas blocks poison
        # Ray's sort shuffle — the doc_pack_chunks engine lesson)
        got = _distinct_pairs(df)
        if got is None:
            return pa.table(
                {"tok": pa.array([], pa.string()),
                 "nd": pa.array([], pa.int64())}
            )
        uniq, _, tok_of = got
        return pa.table(
            {"tok": pa.array(uniq, pa.string()),
             "nd": pa.array(np.bincount(tok_of, minlength=uniq.size), pa.int64())}
        )

    vocab_ds = (
        ds.map_batches(partial_df, batch_format="pandas", batch_size=512)
        .groupby("tok")
        .aggregate(Sum("nd", alias_name="df"))
        .materialize()  # |vocab| rows, pinned in the object store
    )

    if vocab_ds.count() > broadcast_budget:
        # open-vocabulary path: df ⋈ distinct-(doc, tok) pairs on tok
        from ..stages.cc import auto_join_partitions

        if num_partitions is None:
            num_partitions = auto_join_partitions()

        def pairs(df: pd.DataFrame) -> pa.Table:
            got = _distinct_pairs(df)
            if got is None:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "tok": pa.array([], pa.string())}
                )
            uniq, doc_of, tok_of = got
            dids = df["doc_id"].to_numpy(np.int64)
            return pa.table(
                {"doc_id": pa.array(dids[doc_of], pa.int64()),
                 "tok": pa.array(uniq[tok_of], pa.string())}
            )

        pair_ds = ds.map_batches(pairs, batch_format="pandas", batch_size=512)
        j = pair_ds.join(vocab_ds, "inner", num_partitions, on=("tok",))

        def part_sum(df: pd.DataFrame) -> pa.Table:
            s = df.assign(
                n_distinct=np.int64(1),
                rarity_score=(1_000_000 // df["df"].to_numpy(np.int64)),
            ).groupby("doc_id", as_index=False).agg(
                n_distinct=("n_distinct", "sum"),
                rarity_score=("rarity_score", "sum"),
            )
            return pa.Table.from_pandas(s, preserve_index=False)

        return (
            j.map_batches(part_sum, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(
                Sum("n_distinct", alias_name="n_distinct"),
                Sum("rarity_score", alias_name="rarity_score"),
            )
        )

    vocab = vocab_ds.to_pandas().sort_values("tok")
    vref = ray.put(
        (vocab["tok"].to_numpy(dtype=object), vocab["df"].to_numpy(np.int64))
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        got = _distinct_pairs(df)
        if got is None:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "n_distinct": pd.Series([], dtype=np.int64),
                 "rarity_score": pd.Series([], dtype=np.int64)}
            )
        uniq, doc_of, tok_of = got
        vtoks, vdf = _ray.get(vref)
        per_tok = 1_000_000 // vdf[np.searchsorted(vtoks, uniq)]
        n = len(df)
        n_dist = np.bincount(doc_of, minlength=n)
        total = np.bincount(
            doc_of, weights=per_tok[tok_of].astype(np.float64), minlength=n
        ).astype(np.int64)  # exact: per-doc sums < 2^53
        keep = n_dist > 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                "n_distinct": n_dist[keep],
                "rarity_score": total[keep],
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=512)


def lm_surprisal_scores(
    sf_dir: str, broadcast_budget: int = 5_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Bigram-LM surprisal quality scoring — the CCNet/KenLM perplexity
    filter reshaped for oracle exactness. Train an add-one-smoothed bigram
    model over the corpus itself, then score every document by the sum
    over its bigram INSTANCES of the scaled inverse conditional
    probability

        surprise(w1 w2) = ((c(w1·) + V) * 1_000_000) // (c(w1 w2) + 1)
                        = floor(1e6 / P_laplace(w2 | w1))

    where V is the corpus vocabulary size and c(w1·) counts w1 as a
    bigram context. High score = improbable under the corpus's own model,
    the perplexity-filter signal. A production filter sums LOGS of these
    ratios; the linear integer form keeps every step associative and
    bit-exact against the DuckDB oracle (the ``rarity_scores`` precedent —
    no ``ln`` float hazard on either side).

    Distributed shape (vocabulary-sized reductions, never a corpus-sized
    driver table):

    1. per-batch bigram partial counts → ``groupby(big).sum`` → the c12
       table (bigram-vocabulary-sized); the context table c(w1·)
       aggregates FROM that table (not from the corpus again) by
       splitting the bigram key; V from a distinct-token groupby count;
    2. under ``broadcast_budget`` bigram rows, per-bigram integer scores
       build on the driver and broadcast once via ``ray.put`` (sorted
       key array + score array); each batch probes with
       ``np.searchsorted`` and accumulates exact int64 per-doc sums with
       ``np.add.at`` (bincount's float64 weights would round past 2^53);
    3. above it (open bigram vocabulary), c12 ⋈ ctx on the first token
       computes the score column, then (doc_id, bigram, k)-compressed
       instance counts hash-join the score table on the bigram key
       (high-cardinality: join-safe per the ``Dataset.join`` lesson)
       with per-batch partial per-doc sums → ``groupby(doc_id)``.

    Documents with <2 tokens are omitted (SQL parity: the shifted-slice
    unnest emits no pair row). Columns: doc_id, n_bigrams, lm_surprisal.
    """
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def _bigram_arrays(df: pd.DataFrame):
        """(bigram key per instance, batch-local doc index) or None."""
        toks = df["text"].str.lower().str.split()
        n = len(df)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if not flat.size:
            return None
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = np.ones(flat.size, dtype=bool)
        keep[np.cumsum(lens) - 1] = False  # each doc's final token
        idx = np.nonzero(keep)[0]
        if not idx.size:
            return None
        big = pd.Series(flat[idx]).str.cat(pd.Series(flat[idx + 1]), sep=" ")
        return big.to_numpy(dtype=object), doc_of[idx]

    _EMPTY_BIG = pa.table(
        {"big": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def partial_counts(df: pd.DataFrame) -> pa.Table:
        got = _bigram_arrays(df)
        if got is None:
            return _EMPTY_BIG
        uniq, cnt = np.unique(got[0], return_counts=True)
        return pa.table(
            {"big": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    big_ds = (
        ds.map_batches(partial_counts, batch_format="pandas", batch_size=512)
        .groupby("big")
        .aggregate(Sum("n", alias_name="c12"))
        .materialize()  # |bigram vocab| rows, pinned in the object store
    )

    def partial_vocab(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.lower().str.split()
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        uniq = np.unique(flat) if flat.size else np.array([], dtype=object)
        return pa.table({"tok": pa.array(uniq, pa.string())})

    V = int(
        ds.map_batches(partial_vocab, batch_format="pandas", batch_size=512)
        .groupby("tok")
        .aggregate(Count(alias_name="n"))
        .count()
    )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("lm_surprisal", pa.int64())]
    )
    n_big = big_ds.count()
    if n_big == 0:
        # corpus of <2-token docs: Dataset.join aborts on an empty side
        return ray.data.from_arrow(out_schema.empty_table())

    if n_big <= broadcast_budget:
        bt = big_ds.to_pandas()  # bigram-vocab-sized, under budget
        w1 = bt["big"].str.split(" ", n=1).str[0]
        c1 = bt.groupby(w1)["c12"].transform("sum").to_numpy(np.int64)
        c12 = bt["c12"].to_numpy(np.int64)
        score = ((c1 + np.int64(V)) * np.int64(1_000_000)) // (c12 + 1)
        keys = bt["big"].to_numpy(dtype=object)
        order = np.argsort(keys)
        sref = ray.put((keys[order], score[order]))

        def score_batch(df: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            got = _bigram_arrays(df)
            if got is None:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype=np.int64),
                     "n_bigrams": pd.Series([], dtype=np.int64),
                     "lm_surprisal": pd.Series([], dtype=np.int64)}
                )
            big, bdoc = got
            bkeys, bscore = _ray.get(sref)
            s = bscore[np.searchsorted(bkeys, big)]
            n = len(df)
            tot = np.zeros(n, dtype=np.int64)
            np.add.at(tot, bdoc, s)  # exact int64 accumulation
            nb = np.bincount(bdoc, minlength=n)
            kept = nb > 0
            return pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(np.int64)[kept],
                 "n_bigrams": nb[kept].astype(np.int64),
                 "lm_surprisal": tot[kept]}
            )

        return ds.map_batches(score_batch, batch_format="pandas", batch_size=512)

    # open-bigram-vocabulary path: nothing vocabulary-sized on the driver
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()

    def split_ctx(df: pd.DataFrame) -> pa.Table:
        w1 = df["big"].str.split(" ", n=1).str[0]
        return pa.table(
            {"w1": pa.array(w1.to_numpy(dtype=object), pa.string()),
             "n": pa.array(df["c12"].to_numpy(np.int64), pa.int64())}
        )

    ctx_ds = (
        big_ds.map_batches(split_ctx, batch_format="pandas")
        .groupby("w1")
        .aggregate(Sum("n", alias_name="c1"))
    )

    def add_w1(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(w1=df["big"].str.split(" ", n=1).str[0])

    scored = big_ds.map_batches(add_w1, batch_format="pandas").join(
        ctx_ds, "inner", num_partitions, on=("w1",)
    )

    def mk_score(df: pd.DataFrame) -> pa.Table:
        s = (
            (df["c1"].to_numpy(np.int64) + np.int64(V)) * np.int64(1_000_000)
        ) // (df["c12"].to_numpy(np.int64) + 1)
        return pa.table(
            {"big": pa.array(df["big"].to_numpy(dtype=object), pa.string()),
             "s": pa.array(s, pa.int64())}
        )

    score_ds = scored.map_batches(mk_score, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pa.Table:
        got = _bigram_arrays(df)
        if got is None:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "big": pa.array([], pa.string()),
                 "k": pa.array([], pa.int64())}
            )
        big, bdoc = got
        dids = df["doc_id"].to_numpy(np.int64)[bdoc]
        g = (
            pd.DataFrame({"doc_id": dids, "big": big})
            .groupby(["doc_id", "big"], as_index=False, sort=False)
            .size()
        )
        return pa.table(
            {"doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
             "big": pa.array(g["big"].to_numpy(dtype=object), pa.string()),
             "k": pa.array(g["size"].to_numpy(np.int64), pa.int64())}
        )

    pair_ds = ds.map_batches(pairs, batch_format="pandas", batch_size=512)
    j = pair_ds.join(score_ds, "inner", num_partitions, on=("big",))

    def part_sum(df: pd.DataFrame) -> pa.Table:
        k = df["k"].to_numpy(np.int64)
        agg = (
            df.assign(n_bigrams=k, lm_surprisal=k * df["s"].to_numpy(np.int64))
            .groupby("doc_id", as_index=False)
            .agg(n_bigrams=("n_bigrams", "sum"),
                 lm_surprisal=("lm_surprisal", "sum"))
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        j.map_batches(part_sum, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("lm_surprisal", alias_name="lm_surprisal"),
        )
    )


def dedup_filter(
    sf_dir: str, num_partitions: int | None = None, **minhash_kwargs
) -> "ray.data.Dataset":
    """The APPLY step of near-dup dedup: from the MinHash-LSH verified
    clusters (``minhash_near_dups``), keep one representative per cluster
    (its min doc_id = the cluster's ``group_id``) and every unclustered
    document — the distributed ANTI-JOIN that actually shrinks a training
    corpus after detection.

    Scale shape: the cluster table is dup-sized, not corpus-sized, but at
    10¹² docs dup counts can still be huge, so survivors come from a
    native left-outer hash join (corpus ⋈ drop-list) + null filter —
    NO broadcast of the drop set. Columns: doc_id (survivors only)."""
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    groups = minhash_near_dups(sf_dir, **minhash_kwargs)

    def drops(df: pd.DataFrame) -> pa.Table:
        out = df.loc[df["doc_id"] != df["group_id"], ["doc_id"]]
        ids = out["doc_id"].to_numpy(np.int64)
        # Arrow out: feeds the hash join (pandas blocks poison the
        # shuffle); the marker column survives the join (the join strips
        # the right KEY), so null-marker ⇔ unmatched ⇔ survivor
        return pa.table(
            {
                "drop_id": pa.array(ids, pa.int64()),
                "dropped": pa.array(np.ones(ids.size, np.int8), pa.int8()),
            }
        )

    drop_ds = groups.map_batches(drops, batch_format="pandas").materialize()
    docs = read_documents(sf_dir, columns=["doc_id"])
    if drop_ds.count() == 0:
        # no clusters anywhere: every document survives. Short-circuit —
        # a zero-block join side aborts Ray's hash-shuffle join (the
        # phash_near_dups finding)
        def ident(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": pa.compute.cast(t["doc_id"], pa.int64())})

        return docs.map_batches(ident, batch_format="pyarrow")
    j = docs.join(
        drop_ds, "left_outer", num_partitions,
        on=("doc_id",), right_on=("drop_id",),
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pc.cast(
                    t.filter(pc.is_null(t["dropped"]))["doc_id"], pa.int64()
                )
            }
        )

    return j.map_batches(keep, batch_format="pyarrow")


def decontaminate(
    sf_dir: str, eval_doc_ids=(0, 1, 2), window: int = 8
) -> "ray.data.Dataset":
    """Benchmark DECONTAMINATION (the n-gram overlap check run before
    training: drop corpus documents that share a ``window``-token span
    with the eval set). Eval-set window hashes broadcast once via
    ``ray.put`` — eval benchmarks are thousands of documents, a genuine
    small side even when the corpus is 10¹² docs — then one streaming
    membership pass (``np.isin`` against the sorted broadcast array,
    windows hashed by the exact ``ngram_dup_stats`` arithmetic).

    Eval documents themselves are excluded from the output; zero-token
    docs have no windows and are excluded (the ngram-family contract).
    Columns: doc_id, n_windows, n_hits, contaminated."""
    import duckdb

    ids_sql = ",".join(str(int(i)) for i in eval_doc_ids)
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
            f"WHERE doc_id IN ({ids_sql}) ORDER BY doc_id"
        ).fetchall()
    ]
    ev = _shingle_hashes_batch(pd.Series(texts).str.split(), window)
    parts = [h for h in ev if h.size]
    eval_hashes = (
        np.unique(np.concatenate(parts)) if parts
        else np.array([], dtype=np.uint64)
    )
    import ray

    ref = ray.put(eval_hashes)
    eval_ids = np.array(sorted(int(i) for i in eval_doc_ids), dtype=np.int64)
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        evh = ray.get(ref)
        hs = _shingle_hashes_batch(df["text"].str.split(), window)
        dids = df["doc_id"].to_numpy(np.int64)
        n = len(hs)
        nwin = np.fromiter((h.size for h in hs), np.int64, count=n)
        hits = np.zeros(n, dtype=np.int64)
        if nwin.sum():
            # ONE membership pass over the batch's concatenated windows
            # (per-doc hash arrays are unique, so a bincount of the member
            # flags by doc index is the per-doc intersection size)
            flat = np.concatenate([h for h in hs if h.size])
            doc_of = np.repeat(np.arange(n, dtype=np.int64), nwin)
            m = np.isin(flat, evh)
            hits = np.bincount(doc_of[m], minlength=n).astype(np.int64)
        keep = (~np.isin(dids, eval_ids)) & (nwin > 0)
        return pd.DataFrame(
            {
                "doc_id": dids[keep],
                "n_windows": nwin[keep],
                "n_hits": hits[keep],
                "contaminated": (hits[keep] > 0).astype(np.int64),
            }
        )

    return ds.map_batches(flag, batch_format="pandas", batch_size=512)


def lang_confusion(sf_dir: str) -> "ray.data.Dataset":
    """Language-ID evaluation: the (predicted, truth) confusion-matrix
    counts over the corpus — the quality readout a model-based classifier
    stage reports. Rides ``lang_id`` then reduces with per-batch partial
    counts + one |langs|²-bounded groupby. Columns: pred_lang, lang, n."""
    scored = lang_id(sf_dir)

    def partial(df: pd.DataFrame) -> pa.Table:
        out = df.groupby(["pred_lang", "lang"], as_index=False).agg(
            n=("lang", "size")
        )
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        scored.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["pred_lang", "lang"])
        .aggregate(Sum("n", alias_name="n"))
    )


def token_cms(
    sf_dir: str, depth: int = 4, width: int = 1024
) -> "ray.data.Dataset":
    """Count-Min sketch of corpus token frequencies (Cormode &
    Muthukrishnan 2005, public literature) — the mergeable heavy-hitter
    counter a 100-TB pipeline uses where an exact token-count table would
    be vocabulary-sized state per node.

    Every update is an ADD, so the sketch is exactly order- and
    partitioning-independent (unlike Misra-Gries, whose merge depends on
    batch boundaries) — per block: blake2b token hashes (the
    ``_token_hashes`` batched path) re-mixed per row with
    ``splitmix64(h ^ row_seed)``, one ``bincount`` per row. The merge is
    a TREE of vector adds, not a keyed shuffle: fixed-size sketches need
    no groupby (measured: Ray's 4096-key sort aggregate cost 10.9 s on a
    0.1 s workload), so partial sketches repartition to a cluster-sized
    block count, bincount-combine per block, and the driver sums the
    surviving ≤ shuffle_blocks tables (bounded model state, the
    ``ivf_train`` contract). Returns the full counter table
    (cell = row·width + col, cnt); ``cms_estimate`` point-queries it."""
    from ..hashvec import splitmix64

    ds = read_documents(sf_dir, columns=["text"])
    seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(
        0xA24BAED4963EE407
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        hs, _ = _token_hashes(df["text"].str.lower().str.split())
        cnt = np.zeros(depth * width, dtype=np.int64)
        if hs.size:
            for r in range(depth):
                idx = (splitmix64(hs ^ seeds[r]) % np.uint64(width)).astype(
                    np.int64
                )
                cnt[r * width : (r + 1) * width] += np.bincount(
                    idx, minlength=width
                )
        return pa.table(
            {
                "cell": pa.array(
                    np.arange(depth * width, dtype=np.int64), pa.int64()
                ),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    from ..stages.cc import auto_shuffle_blocks

    def combine(t: pa.Table) -> pa.Table:
        cnt = np.bincount(
            t["cell"].to_numpy(zero_copy_only=False),
            weights=t["cnt"].to_numpy(zero_copy_only=False),
            minlength=depth * width,
        ).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(
                    np.arange(depth * width, dtype=np.int64), pa.int64()
                ),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .repartition(auto_shuffle_blocks())
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )
    total = np.zeros(depth * width, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        total += np.bincount(
            b["cell"].to_numpy(zero_copy_only=False),
            weights=b["cnt"].to_numpy(zero_copy_only=False),
            minlength=depth * width,
        ).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "cell": pa.array(
                    np.arange(depth * width, dtype=np.int64), pa.int64()
                ),
                "cnt": pa.array(total, pa.int64()),
            }
        )
    )


def cms_estimate(
    counters: "pd.DataFrame", tokens, depth: int = 4, width: int = 1024
) -> dict:
    """Point-query the CMS table: est(tok) = min over rows of the token's
    counter — always ≥ the true count, over by at most the collision mass
    (ε ≈ e/width of the corpus token total, prob 1−e^−depth)."""
    import hashlib as _hl

    from ..hashvec import splitmix64

    cnt = counters.sort_values("cell")["cnt"].to_numpy(np.int64)
    seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(
        0xA24BAED4963EE407
    )
    out = {}
    for tok in tokens:
        h = np.uint64(
            int.from_bytes(
                _hl.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )
        )
        est = min(
            int(cnt[r * width + int(splitmix64(np.array([h ^ seeds[r]]))[0]
                                    % np.uint64(width))])
            for r in range(depth)
        )
        out[tok] = est
    return out

def cooccurrence_topk(
    sf_dir: str, window: int = 3, k: int = 50
) -> "ray.data.Dataset":
    """Top-k co-occurring token pairs within a ``window``-token sliding
    window — the PMI/word-vector co-occurrence counting kernel.

    A pair is two token POSITIONS (i, j) in the same document with
    ``0 < j - i < window``, emitted as the lexicographically ordered
    (tok_a ≤ tok_b) pair; counts are exact ints, so the oracle hash is
    exact by construction. Top-k orders by (n_pair desc, tok_a, tok_b) —
    a total order, so the k boundary cannot tie.

    Shape: pair generation is one flat vectorized pass per batch (token
    stream + doc-id stream, shifted-mask joins — no per-row Python), the
    per-batch partial groupby collapses to pair-vocabulary cardinality,
    then ONE ``groupby(pair)`` exchange and a result-sized sort+limit.
    100-TB note: the exchange is the operator's inherent all-to-all on
    the open pair vocabulary, same contract as ``rarity_scores``' df
    join; hot pairs (stopword×stopword) pre-collapse inside every batch
    partial before they shuffle."""
    ds = read_documents(sf_dir, columns=["text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks]) \
            if len(toks) else np.empty(0, dtype=object)
        if flat.size:
            flat = np.char.lower(flat.astype(str)).astype(object)
        did = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        parts = []
        for d in range(1, window):
            if flat.size <= d:
                break
            a, b = flat[:-d], flat[d:]
            same = did[:-d] == did[d:]
            lo = np.minimum(a[same], b[same])
            hi = np.maximum(a[same], b[same])
            parts.append(pd.DataFrame({"tok_a": lo, "tok_b": hi}))
        if not parts:
            return pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                                 "tok_b": pd.Series([], dtype=object),
                                 "n_pair": pd.Series([], dtype=np.int64)})
        out = pd.concat(parts, ignore_index=True)
        out["n_pair"] = np.int64(1)
        return out.groupby(["tok_a", "tok_b"], as_index=False).agg(
            n_pair=("n_pair", "sum")
        )

    agg = (
        ds.map_batches(pairs, batch_format="pandas", batch_size=256)
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n_pair", alias_name="n_pair"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["n_pair"] = df["n_pair"].astype(np.int64)
        return df

    return (
        agg.map_batches(final, batch_format="pandas")
        .sort(key=["n_pair", "tok_a", "tok_b"],
              descending=[True, False, False])
        .limit(k)
    )


def len_quantiles_by_lang(sf_dir: str) -> "ray.data.Dataset":
    """Exact grouped quantiles: per-language p25/p50/p75/p90 of document
    length (type-1 / k-th smallest with k = ceil(q·n) — integer-exact, so
    engine and SQL agree bit-for-bit with no interpolation floats).

    Shape: column-pruned read → ONE ``groupby(lang)`` with a sorted
    ``map_groups`` kernel (languages are few and each group's int64
    length column fits a task by orders of magnitude; for corpus-scale
    grouped quantiles over high-cardinality keys the multi-rank partial
    histogram in ``stages/stats.py`` is the recorded upgrade path).
    Columns: lang, n_docs, p25, p50, p75, p90."""
    ds = read_documents(sf_dir, columns=["lang", "n_chars"])

    def q1(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["n_chars"].to_numpy(np.int64))
        n = v.size
        # rank = ceil(num·n / den) via INTEGER arithmetic — float ceil(q·n)
        # would round differently under DuckDB DECIMAL vs IEEE double
        idx = {
            (num, den): (num * n + den - 1) // den - 1
            for num, den in ((1, 4), (1, 2), (3, 4), (9, 10))
        }
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "n_docs": np.array([n], np.int64),
                "p25": v[[idx[(1, 4)]]],
                "p50": v[[idx[(1, 2)]]],
                "p75": v[[idx[(3, 4)]]],
                "p90": v[[idx[(9, 10)]]],
            }
        )

    return ds.groupby("lang").map_groups(q1, batch_format="pandas")


URL_RE = r"https?://([A-Za-z0-9.-]+)(?:/[^\s]*)?"


def url_domains(sf_dir: str, k: int = 15) -> "ray.data.Dataset":
    """Top-k URL domains across the corpus — the crawl-curation stage that
    decides per-domain keep/drop budgets.

    The fixture corpus contains no URLs, so (the ``pii_scrub`` recipe)
    deterministic URLs are INJECTED first from doc_id arithmetic the SQL
    oracle reproduces expression-for-expression: docs with ``doc_id % 3
    == 0`` gain ``http://host<doc_id%13>.example.org/p<doc_id%5>``, docs
    with ``doc_id % 10 == 0`` additionally ``https://cdn<doc_id%4>
    .example.net``. Domains are extracted with one compiled regex via
    vectorized ``str.findall`` (group 1 = host), counted per domain in
    the batch partial, then ONE domain-cardinality exchange and a
    result-sized top-k sort. Ordering (n_urls DESC, domain ASC) is a
    total order — the k boundary cannot tie. Columns: domain, n_urls
    (BIGINT), n_docs (BIGINT)."""
    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype(np.int64)
        t = df["text"]
        inj1 = ids % 3 == 0
        t = t.where(
            ~inj1,
            t + " see http://host" + (ids % 13).astype(str)
            + ".example.org/p" + (ids % 5).astype(str),
        )
        inj2 = ids % 10 == 0
        t = t.where(
            ~inj2, t + " via https://cdn" + (ids % 4).astype(str)
            + ".example.net"
        )
        hosts = t.str.findall(URL_RE)
        lens = hosts.str.len().to_numpy(np.int64)
        if int(lens.sum()) == 0:
            return pd.DataFrame({
                "domain": pd.Series([], dtype=object),
                "n_urls": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
            })
        flat = np.concatenate(
            [np.asarray(h, dtype=object) for h in hosts if len(h)]
        )
        did = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        out = pd.DataFrame({"domain": flat, "doc": did})
        g = out.groupby("domain", as_index=False).agg(
            n_urls=("doc", "size"), n_docs=("doc", "nunique")
        )
        g["n_urls"] = g["n_urls"].astype(np.int64)
        g["n_docs"] = g["n_docs"].astype(np.int64)
        return g

    agg = (
        docs.map_batches(partial, batch_format="pandas", batch_size=256)
        .groupby("domain")
        .aggregate(Sum("n_urls", alias_name="n_urls"),
                   Sum("n_docs", alias_name="n_docs"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["n_urls"] = df["n_urls"].astype(np.int64)
        df["n_docs"] = df["n_docs"].astype(np.int64)
        return df

    return (
        agg.map_batches(final, batch_format="pandas")
        .sort(key=["n_urls", "domain"], descending=[True, False])
        .limit(k)
    )


def heavy_hitters(
    sf_dir: str, k: int = 10, sketch_k: int = 200,
) -> "ray.data.Dataset":
    """Exact top-k frequent tokens via a Misra-Gries sketch + exact
    verification — the SpaceSaving/MG heavy-hitter pattern (Misra & Gries
    1982; mergeability per Agarwal et al. 2012, "Mergeable Summaries").

    Distributed shape (and why it scales):

    1. per-batch WEIGHTED MG summary: count the batch's tokens, then
       prune to ≤ ``sketch_k`` counters by subtracting the (sketch_k+1)-th
       largest count from every counter and dropping non-positives — each
       batch ships ≤ sketch_k rows plus its decrement total, NEVER a
       vocabulary-sized table;
    2. driver merge (rows ≤ n_batches·sketch_k — for a 10^6-batch corpus
       route this through one intermediate ``groupby(tok)`` tree level
       first): sum counters, prune to sketch_k again, tracking the total
       decrement ``D_total`` across all prunes. MG guarantee: any token's
       true count ≤ its merged estimate + D_total, so every token with
       true count > D_total SURVIVES as a candidate;
    3. exact verify: broadcast the ≤ sketch_k candidates (``ray.put`` +
       ``searchsorted``), one result-sized ``groupby(tok)`` over exact
       per-batch candidate counts;
    4. guard: the answer is provably the exact top-k iff the k-th exact
       candidate count > D_total (no dropped token can reach the
       boundary). When the guard fails (near-uniform data with a tiny
       sketch) fall back to the exact vocabulary-sized groupby — the
       always-correct path the sketch exists to avoid at scale.

    Ordering is k-boundary-safe both sides: (n DESC, tok ASC).
    Columns: tok, n."""
    ds = read_documents(sf_dir, columns=["text"])

    def _batch_counts(df: pd.DataFrame):
        toks = df["text"].str.lower().str.split()
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if not flat.size:
            return None
        uniq, cnt = np.unique(flat, return_counts=True)
        return uniq, cnt.astype(np.int64)

    def _mg_prune(uniq, cnt, cap):
        """Subtract the (cap+1)-th largest count; returns survivors and
        the decrement value (0 when already within cap)."""
        if uniq.size <= cap:
            return uniq, cnt, 0
        m = int(np.partition(cnt, uniq.size - cap - 1)[uniq.size - cap - 1])
        keep = cnt > m
        return uniq[keep], cnt[keep] - m, m

    def sketch(df: pd.DataFrame) -> pa.Table:
        got = _batch_counts(df)
        if got is None:
            return pa.table({"tok": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        uniq, cnt, dec = _mg_prune(*got, sketch_k)
        # the decrement side-channel: one NULL-token row per batch
        return pa.table(
            {"tok": pa.array(list(uniq) + [None], pa.string()),
             "cnt": pa.array(list(cnt) + [dec], pa.int64())}
        )

    sk = (
        ds.map_batches(sketch, batch_format="pandas", batch_size=512)
        .to_pandas()  # ≤ n_batches·(sketch_k+1) rows — sketch-sized
    )
    dec_rows = sk["tok"].isna()
    d_total = int(sk.loc[dec_rows, "cnt"].sum())
    merged = (
        sk.loc[~dec_rows].groupby("tok", as_index=False)["cnt"].sum()
    )
    u2, c2, dec2 = _mg_prune(
        merged["tok"].to_numpy(dtype=object),
        merged["cnt"].to_numpy(np.int64), sketch_k)
    # each prune subtracts its decrement from EVERY counter, so the
    # per-token bound  true_count ≤ estimate + Σ decrements  holds with
    # the plain sum (Agarwal et al. 2012, Thm. on MG merging):
    d_total += int(dec2)
    cand = np.sort(u2)
    cref = ray.put(cand)

    def exact_counts(df: pd.DataFrame) -> pa.Table:
        import ray as _ray

        got = _batch_counts(df)
        if got is None:
            return pa.table({"tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = got
        c = _ray.get(cref)
        pos = np.searchsorted(c, uniq)
        pos = np.minimum(pos, c.size - 1)
        hit = c[pos] == uniq if c.size else np.zeros(uniq.size, bool)
        return pa.table({"tok": pa.array(uniq[hit], pa.string()),
                         "n": pa.array(cnt[hit], pa.int64())})

    exact = (
        ds.map_batches(exact_counts, batch_format="pandas", batch_size=512)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ sketch_k rows
        .sort_values(["n", "tok"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    kth = int(exact["n"].iloc[-1]) if len(exact) >= k else -1
    if len(exact) < k or kth <= d_total:
        # guard failed → always-correct exact path (vocabulary-sized)
        def full_counts(df: pd.DataFrame) -> pa.Table:
            got = _batch_counts(df)
            if got is None:
                return pa.table({"tok": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            uniq, cnt = got
            return pa.table({"tok": pa.array(uniq, pa.string()),
                             "n": pa.array(cnt, pa.int64())})

        return (
            ds.map_batches(full_counts, batch_format="pandas", batch_size=512)
            .groupby("tok")
            .aggregate(Sum("n", alias_name="n"))
            .sort(key=["n", "tok"], descending=[True, False])
            .limit(k)
        )
    return ray.data.from_pandas(exact)


def tfidf_top_terms(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-source top-k TF-IDF terms — the "what characterizes this
    subcorpus" report every corpus-curation pipeline runs. Integer
    fixed-point idf surrogate ``1_000_000 // df`` (df = number of SOURCES
    containing the term), the ``rarity_scores`` convention: no ``ln``, no
    float hazards, the DuckDB oracle matches bit-exactly.

    Shape: per-batch (source, tok, tf) partials → one (source, tok)
    groupby (vocabulary×sources-sized, NOT corpus-sized) → df per token
    from that same aggregate (vocabulary-sized groupby) → integer score →
    per-source top-k via ``groupby(source).map_groups`` (each group is
    that source's vocabulary — result-sized). Tie-break (score DESC,
    tok ASC) both sides. Columns: source, rk, tok, tf, score."""
    ds = read_documents(sf_dir, columns=["source", "text"])

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.lower().str.split()
        n = len(df)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if not flat.size:
            return pa.table({"source": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        src = np.repeat(df["source"].to_numpy(dtype=object), lens)
        g = (
            pd.DataFrame({"source": src, "tok": flat})
            .groupby(["source", "tok"], as_index=False, sort=False)
            .size()
        )
        return pa.table({"source": pa.array(g["source"], pa.string()),
                         "tok": pa.array(g["tok"], pa.string()),
                         "tf": pa.array(g["size"].to_numpy(np.int64),
                                        pa.int64())})

    st = (
        ds.map_batches(partial, batch_format="pandas", batch_size=512)
        .groupby(["source", "tok"])
        .aggregate(Sum("tf", alias_name="tf"))
        .materialize()
    )
    dfreq = (
        st.groupby("tok").aggregate(Count(alias_name="df"))
        .to_pandas().sort_values("tok")
    )  # vocabulary-sized; above a broadcast budget this becomes a join
    vref = ray.put((dfreq["tok"].to_numpy(dtype=object),
                    dfreq["df"].to_numpy(np.int64)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        vtoks, vdf = _ray.get(vref)
        dfv = vdf[np.searchsorted(vtoks, df["tok"].to_numpy(dtype=object))]
        out = df.copy()
        out["score"] = df["tf"].to_numpy(np.int64) * (1_000_000 // dfv)
        return out

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "tok"],
                          ascending=[False, True]).head(k).copy()
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "rk", "tok", "tf", "score"]]

    return (
        st.map_batches(score, batch_format="pandas")
        .groupby("source")
        .map_groups(topk, batch_format="pandas")
    )


def bm25_topk(
    sf_dir: str, query: str = "customer merge window", k: int = 20,
) -> "ray.data.Dataset":
    """BM25 document ranking against a fixed query — log-free integer
    fixed-point form so the DuckDB oracle matches bit-exactly (the
    ``doc_lm_surprisal`` precedent for why not log-space).

    With k1=1, b=1/2 the classic per-term BM25 weight
    ``tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` is EXACTLY the rational
    ``4·tf·T / (2·T·tf + T + dl·D)`` (T = corpus token count, D = doc
    count, dl = doc length), and the Robertson idf argument
    ``(N−df+0.5)/(df+0.5)`` becomes the fixed-point
    ``1_000_000·(2·(D−df)+1) // (2·df+1)``. One floor-division per
    (doc, term):

        score += (idf_fp(t) · 4·tf·T) // (2·T·tf + T + dl·D)

    — all int64 (exact while idf_fp·4·tf·T < 2^63; beyond that the
    driver-side combine switches to Python ints). Documents matching no
    query term are omitted; ordering is k-boundary-safe (score DESC,
    doc_id ASC). Columns: doc_id, n_hit, score.

    Shape: one corpus pass emits per-doc (dl, per-query-term tf) thin
    rows (the query is tiny — a broadcast-side lookup, no exchange);
    T/D/df come from driver-scalar aggregates of those rows; scoring is
    a second thin-row pass over the SAME materialized per-doc rows —
    the corpus text is read exactly once."""
    qterms = sorted(set(query.lower().split()))
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    qarr = np.array(qterms, dtype=object)

    def perdoc(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.lower().str.split()
        n = len(df)
        dl = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        tf = np.zeros((n, len(qterms)), np.int64)
        for i, ws in enumerate(toks):
            if not ws:
                continue
            uniq, cnt = np.unique(np.array(ws, dtype=object),
                                  return_counts=True)
            pos = np.searchsorted(uniq, qarr)
            pos = np.minimum(pos, uniq.size - 1)
            hit = uniq[pos] == qarr
            tf[i, hit] = cnt[pos[hit]]
        cols = {"doc_id": pa.array(df["doc_id"].to_numpy(np.int64),
                                   pa.int64()),
                "dl": pa.array(dl, pa.int64())}
        for j, t in enumerate(qterms):
            cols[f"tf{j}"] = pa.array(tf[:, j], pa.int64())
        return pa.table(cols)

    rows = ds.map_batches(
        perdoc, batch_format="pandas", batch_size=512).materialize()
    from ray.data.aggregate import Count as _Count

    agg = rows.aggregate(
        _Count(alias_name="d"), Sum("dl", alias_name="t"),
        *[Sum(f"tf{j}", alias_name=f"s{j}") for j in range(len(qterms))],
    )
    # df(t) = docs with tf>0: one more result-sized aggregate
    def hitflags(t: pa.Table) -> pa.Table:
        cols = {f"h{j}": pa.array(
            (t[f"tf{j}"].to_numpy(zero_copy_only=False) > 0)
            .astype(np.int64), pa.int64()) for j in range(len(qterms))}
        return pa.table(cols)

    dfa = rows.map_batches(hitflags, batch_format="pyarrow").aggregate(
        *[Sum(f"h{j}", alias_name=f"df{j}") for j in range(len(qterms))])
    big_d = int(agg["d"])
    big_t = int(agg["t"])
    idf_fp = np.array(
        [(1_000_000 * (2 * (big_d - int(dfa[f"df{j}"] or 0)) + 1))
         // (2 * int(dfa[f"df{j}"] or 0) + 1)
         for j in range(len(qterms))], dtype=np.int64)
    iref = ray.put((idf_fp, big_d, big_t))

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray

        idf, dd, tt = _ray.get(iref)
        dl = t["dl"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        total = np.zeros(len(dl), np.int64)
        nhit = np.zeros(len(dl), np.int64)
        denom_base = tt + dl * dd
        for j in range(idf.size):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)
            hit = tf > 0
            total[hit] += (idf[j] * 4 * tf[hit] * tt) // (
                2 * tt * tf[hit] + denom_base[hit])
            nhit += hit
        keep = nhit > 0
        return pa.table({"doc_id": pa.array(did[keep], pa.int64()),
                         "n_hit": pa.array(nhit[keep], pa.int64()),
                         "score": pa.array(total[keep], pa.int64())})

    return (
        rows.map_batches(score, batch_format="pyarrow")
        .sort(key=["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
