"""Single-process expected-value witnesses for the text / ANN operators.

The driver's correctness gate compares each Ray pipeline against DuckDB SQL.
The hashing operators (MinHash-LSH, SimHash, fingerprints) and the bucketed
ANN search are not SQL-expressible, so this module computes their expected
outputs **single-process, scalar-first** (independent of the distributed
code paths — plain dicts, Python-int modular arithmetic, a union-find) and
writes them as parquet witnesses into the fixture dir; the oracle SQL is
then a trivial ``SELECT * FROM read_parquet(witness)``.

Everything here is deliberately oracle-style: whole-table loops, no Ray, no
shared code with ``ops.py`` beyond the published constants (permutation
seeds, band count, the FNV base) — those constants ARE the operator
definition, so both sides must read them.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .ops import _FP_BASE

__all__ = ["ensure_doc_witnesses"]

_M64 = (1 << 64) - 1
_P61 = (1 << 61) - 1


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _sm64(x: int) -> int:
    """splitmix64 finalizer with Python ints (parity with
    ``hashvec.splitmix64``'s numpy uint64 arithmetic)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    x ^= x >> 31
    return x


def _tokens(text: str) -> list[str]:
    return text.split()


def _shingle_strs(tokens: list[str], n: int) -> set:
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def minhash_groups_witness(
    docs: pd.DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    jaccard_threshold: float = 0.5,
) -> pd.DataFrame:
    """Expected (doc_id, group_id) rows of ``ops.minhash_near_dups``.

    Same contract, scalar implementation: per-bucket STAR edges (sorted-min
    ↔ member), exact string-shingle Jaccard per edge, union-find grouping.
    The permutation family replicates the engine's uint64 wrap-then-mod
    arithmetic with explicit Python-int masks.
    """
    r = num_perm // bands
    # permutation constants — uint64 wrap BEFORE the mod-p, like the engine
    A = [(((k * 0x9E3779B97F4A7C15) & _M64) | 1) % _P61 for k in range(1, num_perm + 1)]
    B = [((k * 0xC2B2AE3D27D4EB4F) & _M64) % _P61 for k in range(1, num_perm + 1)]
    base = int(_FP_BASE)

    buckets: dict = {}
    shingles: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        did = int(doc_id)
        toks = _tokens(text)
        sh = _shingle_strs(toks, n)
        shingles[did] = sh
        if not sh:
            continue
        # shingle hash = polynomial combine of the n blake2b-8 TOKEN
        # hashes mod 2^64 (the engine's vectorized arithmetic, replicated
        # with Python ints); docs shorter than n combine all their tokens
        th = [_h64(w) for w in toks]
        wins = [th] if len(th) < n else [th[i : i + n] for i in range(len(th) - n + 1)]
        hset = {
            sum(h * pow(base, len(w) - 1 - j, 1 << 64) for j, h in enumerate(w)) & _M64
            for w in wins
        }
        hs = sorted(x % _P61 for x in hset)
        sig = []
        for a, b in zip(A, B):
            # engine arithmetic: ((a·h mod 2^64) + b mod 2^64) mod p, min
            # over shingles of the already-mod-p value
            sig.append(min(((((a * h) & _M64) + b) & _M64) % _P61 for h in hs))
        for bd in range(bands):
            chunk = sig[bd * r : (bd + 1) * r]
            # band hash = splitmix64 chained across the band slice — the
            # engine's hashvec.mix64_rows arithmetic with Python-int masks
            h = 0
            for v in chunk:
                h = _sm64(h ^ v)
            buckets.setdefault((bd, _signed64(h)), []).append(did)

    edges = set()
    for members in buckets.values():
        ids = sorted(set(members))
        if len(ids) < 2:
            continue
        for other in ids[1:]:
            edges.add((ids[0], other))

    # exact-Jaccard verify on string shingle sets
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    members = set()
    for a, b in sorted(edges):
        sa, sb = shingles[a], shingles[b]
        union = len(sa | sb)
        if union == 0 or len(sa & sb) / union < jaccard_threshold:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
        members.add(a)
        members.add(b)

    rows = sorted((m, find(m)) for m in members)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype=np.int64),
            "group_id": pd.Series([r[1] for r in rows], dtype=np.int64),
        }
    )


def simhash_witness(docs: pd.DataFrame) -> pd.DataFrame:
    """Expected (doc_id, simhash): the scalar per-token definition — bit k
    set iff Σ ±1 contributions of bit k over the doc's tokens is > 0."""
    out = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        acc = [0] * 64
        for w in _tokens(text):
            h = _h64(w)
            for k in range(64):
                acc[k] += 1 if (h >> k) & 1 else -1
        v = 0
        for k in range(64):
            if acc[k] > 0:
                v |= 1 << k
        out.append((int(doc_id), _signed64(v)))
    return pd.DataFrame(
        {
            "doc_id": pd.Series([o[0] for o in out], dtype=np.int64),
            "simhash": pd.Series([o[1] for o in out], dtype=np.int64),
        }
    )


def fingerprint_witness(docs: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Expected (doc_id, fingerprint): min over token windows of the
    polynomial hash Σ h_i · B^(len-1-i) mod 2^64, Python-int arithmetic."""
    base = int(_FP_BASE)
    out = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        hs = [_h64(w) for w in _tokens(text)]
        if not hs:
            out.append((int(doc_id), 0))
            continue
        if len(hs) < window:
            wins = [hs]
        else:
            wins = [hs[j : j + window] for j in range(len(hs) - window + 1)]
        best = min(
            sum(h * pow(base, len(w) - 1 - i, 1 << 64) for i, h in enumerate(w)) & _M64
            for w in wins
        )
        out.append((int(doc_id), _signed64(best)))
    return pd.DataFrame(
        {
            "doc_id": pd.Series([o[0] for o in out], dtype=np.int64),
            "fingerprint": pd.Series([o[1] for o in out], dtype=np.int64),
        }
    )


def ivf_topk_witness(
    emb: pd.DataFrame, query_ids=(0, 1, 2), k: int = 10, n_centroids: int = 8,
    nprobe: int = 1,
) -> pd.DataFrame:
    """Expected (qid, vec_id, sim, rank) of ``ann.ivf_topk``: centroids =
    first C vectors, every vector assigned to its max-cosine centroid, each
    query scans only its ``nprobe`` nearest buckets; sim rounded to 6
    decimals, ranked by (sim desc, vec_id asc)."""
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    ids = np.sort(ids)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cn = mn[:n_centroids]
    cids = ids[:n_centroids]
    bucket = cids[np.argmax(mn @ cn.T, axis=1)]
    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(ids, qid))
        probed = cids[
            np.argsort(-(mn[qi] @ cn.T), kind="stable")[: max(1, nprobe)]
        ]
        keep = np.isin(bucket, probed) & (ids != qid)
        sims = np.round(mn[keep] @ mn[qi], 6)
        vv = ids[keep]
        order = np.lexsort((vv, -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(qid), int(vv[j]), float(sims[j]), rank))
    return pd.DataFrame(
        {
            "qid": pd.Series([r[0] for r in rows], dtype=np.int64),
            "vec_id": pd.Series([r[1] for r in rows], dtype=np.int64),
            "sim": pd.Series([r[2] for r in rows], dtype=np.float64),
            "rank": pd.Series([r[3] for r in rows], dtype=np.int64),
        }
    )


def emb_near_dups_witness(
    emb: pd.DataFrame, threshold: float = 0.4, n_centroids: int = 8
) -> pd.DataFrame:
    """Expected (vec_id, group_id) of ``ann.emb_near_dups``: IVF-bucket
    blocking, within-bucket first-earlier-match star edges at rounded
    cosine ≥ threshold, union-find grouping — single-process."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cn = mn[:n_centroids]
    bucket = ids[:n_centroids][np.argmax(mn @ cn.T, axis=1)]
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    members = set()
    for b in np.unique(bucket):
        sel = np.nonzero(bucket == b)[0]  # already vec_id-sorted
        sims = np.round(mn[sel] @ mn[sel].T, 6)
        for i in range(1, sel.size):
            hits = np.nonzero(sims[i, :i] >= threshold)[0]
            if hits.size == 0:
                continue
            u, v = int(ids[sel[hits[0]]]), int(ids[sel[i]])
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
            members.add(u)
            members.add(v)
    rows = sorted((m, find(m)) for m in members)
    return pd.DataFrame(
        {
            "vec_id": pd.Series([r[0] for r in rows], dtype=np.int64),
            "group_id": pd.Series([r[1] for r in rows], dtype=np.int64),
        }
    )


def ivf_train_witness(
    emb: pd.DataFrame, n_centroids: int = 8, iters: int = 3
) -> pd.DataFrame:
    """Expected (centroid, n) of ``ann.ivf_train``: whole-table Lloyd with
    the same init (first C normalized vectors), the same
    normalize-the-sum update, and the same 9-decimal per-iteration
    rounding that makes the float orders agree."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cents = np.round(mn[:n_centroids], 9)
    for _ in range(iters):
        best = np.argmax(mn @ cents.T, axis=1)
        new = cents.copy()
        for c in range(n_centroids):
            sel = mn[best == c]
            if sel.shape[0]:
                v = sel.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    new[c] = v / nv
        cents = np.round(new, 9)
    best = np.argmax(mn @ cents.T, axis=1)
    vals, counts = np.unique(best, return_counts=True)
    return pd.DataFrame(
        {
            "centroid": pd.Series(vals, dtype=np.int64),
            "n": pd.Series(counts, dtype=np.int64),
        }
    )


def pq_codes_witness(
    emb: pd.DataFrame, m: int = 4, k: int = 16, iters: int = 3
) -> pd.DataFrame:
    """Expected (vec_id, c0..c{m-1}, err_ppm) of ``ann.emb_pq``:
    whole-table product quantization — per contiguous subspace, Lloyd
    k-means (init = first k subvectors, mean update, 9-decimal rounding
    per iteration like ``ivf_train``), assignment by squared L2 with the
    SAME numpy expression tree as the distributed stage so argmin ties
    and the floor-quantized reconstruction error agree bit-for-bit."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, dim = mat.shape
    sd = dim // m
    codes = np.zeros((n, m), dtype=np.int64)
    err = np.zeros(n, dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * sd : (s + 1) * sd]
        cb = np.round(sub[:k], 9)
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            best = np.argmin(d2, axis=1)
            new = cb.copy()
            for c in range(k):
                sel = sub[best == c]
                if sel.shape[0]:
                    new[c] = sel.sum(axis=0) / sel.shape[0]
            cb = np.round(new, 9)
        d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)
        codes[:, s] = best
        err = err + d2[np.arange(n), best]
    out = {"vec_id": emb["vec_id"].astype(np.int64)}
    for s in range(m):
        out[f"c{s}"] = pd.Series(codes[:, s], dtype=np.int64)
    out["err_ppm"] = pd.Series(np.floor(err * 1e6), dtype=np.int64)
    return pd.DataFrame(out)


def ngram_dup_witness(docs: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Expected (doc_id, total_windows, dup_windows) of
    ``ops.ngram_dup_stats``: per-doc UNIQUE window hashes (the engine's
    polynomial-combine arithmetic with Python ints — same as the minhash
    witness's shingle hashes but n=window), a whole-corpus counter of
    distinct-doc occurrences, then per-doc counts of windows seen in ≥ 2
    docs. Zero-token docs have no windows and are excluded (the operator's
    documented contract)."""
    from collections import Counter

    base = int(_FP_BASE)
    per_doc: dict[int, set] = {}
    counter: Counter = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        if not toks:
            continue
        th = [_h64(w) for w in toks]
        wins = (
            [th]
            if len(th) < window
            else [th[i : i + window] for i in range(len(th) - window + 1)]
        )
        hset = {
            sum(h * pow(base, len(w) - 1 - j, 1 << 64) for j, h in enumerate(w)) & _M64
            for w in wins
        }
        per_doc[int(doc_id)] = hset
        counter.update(hset)
    rows = [
        (did, len(hset), sum(1 for h in hset if counter[h] >= 2))
        for did, hset in sorted(per_doc.items())
    ]
    return pd.DataFrame(
        rows, columns=["doc_id", "total_windows", "dup_windows"]
    ).astype({"doc_id": "int64", "total_windows": "int64", "dup_windows": "int64"})


def decontam_witness(
    docs: pd.DataFrame, eval_doc_ids=(0, 1, 2), window: int = 8
) -> pd.DataFrame:
    """Expected (doc_id, n_windows, n_hits, contaminated) of
    ``ops.decontaminate``: per-doc UNIQUE window-hash sets (the exact
    ngram_dup arithmetic), eval set = the union over ``eval_doc_ids``,
    hits = intersection size; eval docs and zero-token docs excluded."""
    base = int(_FP_BASE)
    per_doc: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        if not toks:
            continue
        th = [_h64(w) for w in toks]
        wins = (
            [th]
            if len(th) < window
            else [th[i : i + window] for i in range(len(th) - window + 1)]
        )
        per_doc[int(doc_id)] = {
            sum(h * pow(base, len(w) - 1 - j, 1 << 64) for j, h in enumerate(w)) & _M64
            for w in wins
        }
    ev: set = set()
    for i in eval_doc_ids:
        ev |= per_doc.get(int(i), set())
    rows = [
        (did, len(hset), len(hset & ev), int(bool(hset & ev)))
        for did, hset in sorted(per_doc.items())
        if did not in set(int(i) for i in eval_doc_ids)
    ]
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "n_hits", "contaminated"]
    ).astype(
        {"doc_id": "int64", "n_windows": "int64", "n_hits": "int64",
         "contaminated": "int64"}
    )


def ivfpq_topk_witness(
    emb: pd.DataFrame, query_ids=(0, 1, 2), k: int = 10, n_centroids: int = 8,
    m: int = 4, kpq: int = 16, iters: int = 3, nprobe: int = 1,
) -> pd.DataFrame:
    """Expected (qid, vec_id, adist_ppm, rank) of ``ann.ivfpq_topk``:
    IVF bucket pruning (the ivf_topk_witness logic) + PQ asymmetric
    distance with whole-table-trained codebooks (the pq_codes_witness
    Lloyd, 9-dec rounding) — identical expression trees, so the floor-ppm
    distances match bit-for-bit."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    dim = mat.shape[1]
    sd = dim // m
    books = []
    codes = np.zeros((mat.shape[0], m), dtype=np.int64)
    for s in range(m):
        sub = mat[:, s * sd : (s + 1) * sd]
        cb = np.round(sub[:kpq], 9)
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            best = np.argmin(d2, axis=1)
            new = cb.copy()
            for c in range(kpq):
                sel = sub[best == c]
                if sel.shape[0]:
                    new[c] = sel.sum(axis=0) / sel.shape[0]
            cb = np.round(new, 9)
        d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)
        books.append(cb)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cn = mn[:n_centroids]
    cids = ids[:n_centroids]
    bucket = cids[np.argmax(mn @ cn.T, axis=1)]
    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(ids, qid))
        probed = cids[
            np.argsort(-(mn[qi] @ cn.T), kind="stable")[: max(1, nprobe)]
        ]
        keep = np.isin(bucket, probed) & (ids != qid)
        ad = np.zeros(mat.shape[0], dtype=np.float64)
        for s in range(m):
            dt = ((mat[qi, s * sd : (s + 1) * sd][None, :] - books[s]) ** 2).sum(axis=1)
            ad = ad + dt[codes[:, s]]
        ppm = np.floor(ad * 1e6).astype(np.int64)
        vv, dd = ids[keep], ppm[keep]
        order = np.lexsort((vv, dd))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(qid), int(vv[j]), int(dd[j]), rank))
    return pd.DataFrame(
        {
            "qid": pd.Series([r[0] for r in rows], dtype=np.int64),
            "vec_id": pd.Series([r[1] for r in rows], dtype=np.int64),
            "adist_ppm": pd.Series([r[2] for r in rows], dtype=np.int64),
            "rank": pd.Series([r[3] for r in rows], dtype=np.int64),
        }
    )


def hll_witness(keys, m: int = 256) -> pd.DataFrame:
    """Expected (reg, rho) registers of ``relational.events_hll``:
    scalar splitmix64 per key, register = top 8 bits, rho = 1 + leading
    zeros of the low 56 bits (0 → 57), max per register — Python-int
    mirror of the vectorized unpackbits path."""
    regs = [0] * m
    for k in keys:
        h = _sm64(int(k) & _M64)
        r = h >> 56
        rem = h & ((1 << 56) - 1)
        rho = 57 - rem.bit_length() if rem else 57
        if rho > regs[r]:
            regs[r] = rho
    return pd.DataFrame(
        {"reg": pd.Series(range(m), dtype=np.int64),
         "rho": pd.Series(regs, dtype=np.int64)}
    )


def cms_witness(
    docs: pd.DataFrame, depth: int = 4, width: int = 1024
) -> pd.DataFrame:
    """Expected (cell, cnt) counters of ``ops.token_cms``: per token
    OCCURRENCE (lowercased whitespace tokens), row r increments cell
    ``splitmix64(blake2b8(tok) ^ (r+1)·SEED) mod width`` — Python-int
    mirror of the vectorized path (adds commute, so the scalar order is
    irrelevant)."""
    seed0 = 0xA24BAED4963EE407
    cnt = [0] * (depth * width)
    for text in docs["text"]:
        for tok in text.lower().split():
            h = _h64(tok)
            for r in range(depth):
                seed = ((r + 1) * seed0) & _M64
                c = _sm64(h ^ seed) % width
                cnt[r * width + c] += 1
    return pd.DataFrame(
        {"cell": pd.Series(range(depth * width), dtype=np.int64),
         "cnt": pd.Series(cnt, dtype=np.int64)}
    )


def _write_atomic(df: pd.DataFrame, path: str) -> None:
    """Write-to-temp + rename (same pattern as ``fixtures._write_atomic``):
    a crash mid-generation must never leave a truncated parquet a
    concurrent oracle SELECT could read."""
    import tempfile

    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def ensure_doc_witnesses(tag: str, out_dir: str, testdata_root: str = "/root/testdata") -> None:
    """Idempotently write the doc/ANN witness parquets for a scale tag into
    ``out_dir`` (the fixture dir the oracle SQL reads). Marker name is
    documented in FIXTURES.md — keep the two in sync."""
    done = os.path.join(out_dir, "_DOC_WITNESS_V12")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(
        os.path.join(testdata_root, tag, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    emb = pq.read_table(os.path.join(testdata_root, tag, "embeddings.parquet")).to_pandas()
    _write_atomic(
        minhash_groups_witness(docs),
        os.path.join(out_dir, "witness_minhash_groups.parquet"),
    )
    _write_atomic(simhash_witness(docs), os.path.join(out_dir, "witness_simhash.parquet"))
    _write_atomic(
        fingerprint_witness(docs), os.path.join(out_dir, "witness_fingerprint.parquet")
    )
    _write_atomic(ivf_topk_witness(emb), os.path.join(out_dir, "witness_ivf_topk.parquet"))
    _write_atomic(
        emb_near_dups_witness(emb), os.path.join(out_dir, "witness_emb_near_dups.parquet")
    )
    _write_atomic(ivf_train_witness(emb), os.path.join(out_dir, "witness_ivf_train.parquet"))
    _write_atomic(
        ivf_topk_witness(emb, nprobe=2),
        os.path.join(out_dir, "witness_ivf_topk_p2.parquet"),
    )
    _write_atomic(
        ngram_dup_witness(docs), os.path.join(out_dir, "witness_ngram_dup.parquet")
    )
    _write_atomic(
        pq_codes_witness(emb), os.path.join(out_dir, "witness_pq_codes.parquet")
    )
    _write_atomic(
        decontam_witness(docs), os.path.join(out_dir, "witness_decontam.parquet")
    )
    ev_keys = pq.read_table(
        os.path.join(testdata_root, tag, "events.parquet"), columns=["user_id"]
    )["user_id"].to_numpy()
    _write_atomic(
        hll_witness(ev_keys), os.path.join(out_dir, "witness_hll.parquet")
    )
    _write_atomic(
        ivfpq_topk_witness(emb),
        os.path.join(out_dir, "witness_ivfpq_topk.parquet"),
    )
    _write_atomic(
        cms_witness(docs), os.path.join(out_dir, "witness_cms.parquet")
    )
    with open(done, "w") as f:
        f.write("ok\n")
