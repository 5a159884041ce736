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


def token_stats(sf_dir: str) -> "ray.data.Dataset":
    """Whitespace-token counts per language: n_docs, n_tokens, n_chars.
    Pre-aggregated per batch; the groupby moves one row per (batch, lang)."""
    ds = read_documents(sf_dir, columns=["lang", "text", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(n_tokens=df["text"].str.count(_TOKEN_RE))
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("lang", "size"),
            n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"),
        )
        return g

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=512)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )


def _doc_quality(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.split()
    wc = toks.map(len).astype(np.int64)
    stop = toks.map(lambda ws: sum(w in STOPWORDS for w in ws))
    uniq = toks.map(lambda ws: len(set(ws)))
    mean_len = toks.map(lambda ws: sum(len(w) for w in ws) / max(1, len(ws)))
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
        toks = df["text"].str.lower().str.split()

        def best(ws):
            scores = {k: sum(w in m for w in ws) for k, m in markers.items()}
            top = max(scores.values())
            hits = sorted(k for k, v in scores.items() if v == top)
            return hits[0] if top > 0 and len(hits) == 1 else "und"

        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": toks.map(best), "lang": df["lang"]}
        )

    return ds.map_batches(predict, batch_format="pandas", batch_size=256)


def _shingles(tokens: list, n: int = 3) -> set:
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


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
    q_sh = _shingles(q_text.split(), n)
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        sims = []
        for t in df["text"]:
            s = _shingles(t.split(), n)
            inter = len(s & q_sh)
            union = len(s | q_sh)
            sims.append(inter / union if union else 0.0)
        return pd.DataFrame({"doc_id": df["doc_id"], "sim": np.round(sims, 4)})

    out = ds.map_batches(score, batch_format="pandas", batch_size=256)
    return out.sort(["sim", "doc_id"], descending=[True, False]).limit(top_k)


def _minhash_matrix(texts: pd.Series, num_perm: int, n: int) -> np.ndarray:
    """(len, num_perm) uint64 MinHash signatures over word n-shingles.

    Permutations are the classic (a*h + b) mod p family with fixed
    deterministic a, b; the base shingle hash is blake2b-8 (stable)."""
    p = (1 << 61) - 1
    rng = np.arange(1, num_perm + 1, dtype=np.uint64)
    a = (rng * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)) % np.uint64(p)
    b = (rng * np.uint64(0xC2B2AE3D27D4EB4F)) % np.uint64(p)
    out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingles(t.split(), n)
        if not sh:
            continue
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
                for s in sh
            ),
            dtype=np.uint64,
            count=len(sh),
        )
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
) -> "ray.data.Dataset":
    """MinHash + LSH near-duplicate pairs, verified by exact Jaccard.

    Stages: signature ``map_batches`` → explode to (band, band_hash, doc_id)
    rows → ``groupby(band, band_hash)`` → candidate pairs within buckets →
    dedup pairs → exact shingle-Jaccard verify (re-reads only the candidate
    docs, broadcast as a dict). Columns: doc_a, doc_b, jaccard (4-dec).

    Scale note: the only all-to-all move is the (band, band_hash) groupby of
    ~bands rows per doc; verification joins candidates against a broadcast
    of just the candidate texts (the candidate set is assumed ≪ corpus —
    true when thresholds are meaningful; log-guarded below).
    """
    rows_per_band = num_perm // bands
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        sigs = _minhash_matrix(df["text"], num_perm, n)
        band_ids = np.repeat(np.arange(bands), len(df))
        doc_ids = np.tile(df["doc_id"].to_numpy(), bands)
        hashes = np.empty(bands * len(df), dtype=np.uint64)
        for bnd in range(bands):
            chunk = sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            hashes[bnd * len(df) : (bnd + 1) * len(df)] = np.array(
                [
                    int.from_bytes(
                        hashlib.blake2b(c.tobytes(), digest_size=8).digest(), "little"
                    )
                    for c in chunk
                ],
                dtype=np.uint64,
            )
        return pd.DataFrame(
            {
                "band": band_ids.astype(np.int32),
                "band_hash": hashes.astype(np.int64),
                "doc_id": doc_ids,
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ii, jj = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})

    pairs = (
        ds.map_batches(sig_rows, batch_format="pandas", batch_size=128)
        # coalesce before the shuffle: sort-shuffle cost grows with block
        # count and the sig stage emits many small blocks
        .repartition(16)
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .repartition(8)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )
    # candidate set is small: collect ids, broadcast candidate texts
    pair_rows = pairs.to_pandas()
    if len(pair_rows) == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=np.float64)})
        )
    need = sorted(set(pair_rows["doc_a"]) | set(pair_rows["doc_b"]))
    texts = {}
    for b in (
        ds.map_batches(
            lambda df, _n=set(need): df[df["doc_id"].isin(_n)],
            batch_format="pandas",
        ).iter_batches(batch_format="pandas")
    ):
        for did, t in zip(b["doc_id"], b["text"]):
            texts[int(did)] = t
    sh = {d: _shingles(texts[d].split(), n) for d in need}
    out = []
    for _, r in pair_rows.iterrows():
        a, bdoc = int(r["doc_a"]), int(r["doc_b"])
        inter = len(sh[a] & sh[bdoc])
        union = len(sh[a] | sh[bdoc])
        j = inter / union if union else 0.0
        if j >= jaccard_threshold:
            out.append((a, bdoc, round(j, 4)))
    out.sort()
    return ray.data.from_pandas(
        pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])
        if out
        else pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                           "doc_b": pd.Series([], dtype=np.int64),
                           "jaccard": pd.Series([], dtype=np.float64)})
    )


def simhash_docs(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash per document over whitespace tokens (blake2b token
    hashes, unweighted). Columns: doc_id, simhash (int64)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def sim(df: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            acc = np.zeros(64, dtype=np.int64)
            for w in t.split():
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            val = 0
            for bit in np.nonzero(acc > 0)[0]:
                val |= 1 << int(bit)
            out[i] = np.int64(np.uint64(val).astype(np.int64))
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})

    return ds.map_batches(sim, batch_format="pandas", batch_size=128)


def fingerprint_docs(sf_dir: str, window: int = 8) -> "ray.data.Dataset":
    """Winnowing-style document fingerprint: rolling blake2b over token
    windows, keep the minimum hash per document (a compact content id).
    Columns: doc_id, fingerprint (int64)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            ws = t.split()
            if len(ws) < window:
                grams = [" ".join(ws)]
            else:
                grams = [" ".join(ws[j : j + window]) for j in range(len(ws) - window + 1)]
            m = min(
                int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
                )
                for g in grams
            )
            out[i] = np.uint64(m).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": out})

    return ds.map_batches(fp, batch_format="pandas", batch_size=128)
