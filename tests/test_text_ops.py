"""Text-op tests: distributed CC, scale-safe MinHash-LSH, batched hashing.

The witness module (``text/witness.py``) is the scalar single-process
reference; the distributed ops must reproduce it bit-for-bit. The
pathological-bucket test pins the round-2 contract: a degenerate LSH bucket
(every document identical) emits O(n) star edges, not O(n²) pairs.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_connected_components_shapes():
    import ray.data

    from hydro_raster_ray.stages.cc import connected_components

    # 30-hop path + triangle + isolated edge
    a = list(range(30)) + [100, 101] + [500]
    b = list(range(1, 31)) + [101, 102] + [501]
    edges = ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    for budget in (5_000_000, 0):  # driver union-find AND distributed path
        lab = connected_components(
            edges, num_partitions=2, driver_budget=budget
        ).to_pandas()
        by = dict(zip(lab["node"], lab["label"]))
        assert all(by[i] == 0 for i in range(31))
        assert by[100] == by[101] == by[102] == 100
        assert by[500] == by[501] == 500
        assert len(lab) == 31 + 3 + 2


def test_cc_long_chain_converges_via_pointer_jumping():
    """A 300-node path has diameter >> max_iters=8: plain 1-hop propagation
    cannot finish, pointer jumping (label := label[label]) must."""
    import ray.data

    from hydro_raster_ray.stages.cc import connected_components

    n = 300
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(n - 1)), pa.int64()),
                "b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    lab = connected_components(
        edges, num_partitions=2, driver_budget=0, max_iters=8
    ).to_pandas()
    assert len(lab) == n
    assert (lab["label"] == 0).all()


def test_cc_unconverged_raises_instead_of_silent_split():
    """Without pointer jumping (jump_budget=0) a long chain cannot converge
    in 2 rounds — the round-2 code silently returned SPLIT components; now
    it must raise."""
    import ray.data

    from hydro_raster_ray.stages.cc import connected_components

    n = 40
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(n - 1)), pa.int64()),
                "b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="still changing"):
        connected_components(
            edges, num_partitions=2, driver_budget=0, max_iters=2, jump_budget=0
        )


def test_attach_labels_join_path_exact_above_2_53():
    """The hash-join fallback must keep int64 node ids exact: ids >= 2^53
    would be corrupted by a float64 (pandas nulls) round-trip."""
    import ray.data

    from hydro_raster_ray.stages.cc import attach_labels

    big = (1 << 60) + 1  # not representable in float64
    nodes = [big, big + 3, 7]
    ds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    labels = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([big + 3], pa.int64()),
                "label": pa.array([big], pa.int64()),
            }
        )
    )
    out = attach_labels(
        ds, labels, num_partitions=2, broadcast_budget=0
    ).to_pandas()
    got = dict(zip(out["node"], out["root"]))
    assert got[big] == big  # unlabeled keeps its own id, bit-exact
    assert got[big + 3] == big
    assert got[7] == 7


def test_minhash_matches_scalar_witness():
    from hydro_raster_ray.text import ops, witness

    got = ops.minhash_near_dups(SF).to_pandas().reset_index(drop=True)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = witness.minhash_groups_witness(docs)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0  # the fixture does contain near-dups


def test_minhash_pathological_identical_bucket(tmp_path):
    """All-identical corpus: every LSH bucket is degenerate. The star-edge
    emission is O(n) and the result is a single cluster rooted at doc 0."""
    n = 300
    t = "the same boilerplate sentence repeated across the entire web corpus"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array([t] * n, pa.string()),
            }
        ),
        os.path.join(tmp_path, "documents.parquet"),
    )
    from hydro_raster_ray.text import ops

    got = ops.minhash_near_dups(str(tmp_path)).to_pandas()
    assert len(got) == n
    assert (got["group_id"] == 0).all()
    assert sorted(got["doc_id"]) == list(range(n))


def test_simhash_matches_scalar_witness():
    from hydro_raster_ray.text import ops, witness

    got = (
        ops.simhash_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = witness.simhash_witness(docs).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_fingerprint_matches_scalar_witness():
    from hydro_raster_ray.text import ops, witness

    got = (
        ops.fingerprint_docs(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = (
        witness.fingerprint_witness(docs).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_ivf_topk_matches_witness_and_prunes_reads():
    from hydro_raster_ray.text import ann, witness

    got = (
        ann.ivf_topk(SF)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)[["qid", "vec_id", "sim", "rank"]]
    )
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    want = witness.ivf_topk_witness(emb).sort_values(["qid", "rank"]).reset_index(
        drop=True
    )
    got["rank"] = got["rank"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # the index is bucket-partitioned on disk (Hive dirs per centroid)
    idx = ann.ivf_build(SF)
    parts = [d for d in os.listdir(idx) if d.startswith("centroid=")]
    assert len(parts) >= 2


def test_ivf_topk_tolerates_empty_probed_buckets():
    """With nprobe ≥ 2 a probed centroid may own zero vectors — the Hive
    write creates no directory for it, and the scan must skip it instead
    of raising. Simulated by hiding bucket dirs from the built index
    (restored afterwards): one missing bucket still answers from the
    rest; ALL buckets missing yields an empty, correctly-typed result."""
    import shutil

    from hydro_raster_ray.text import ann

    idx = ann.ivf_build(SF)
    parts = sorted(d for d in os.listdir(idx) if d.startswith("centroid="))
    assert len(parts) >= 2
    hidden = []
    try:
        shutil.move(os.path.join(idx, parts[0]), os.path.join(idx, "_h0"))
        hidden.append((os.path.join(idx, "_h0"), os.path.join(idx, parts[0])))
        got = ann.ivf_topk(SF, nprobe=len(parts)).to_pandas()
        assert len(got) > 0  # answered from the remaining buckets
        for i, d in enumerate(parts[1:], 1):
            shutil.move(os.path.join(idx, d), os.path.join(idx, f"_h{i}"))
            hidden.append(
                (os.path.join(idx, f"_h{i}"), os.path.join(idx, d))
            )
        empty = ann.ivf_topk(SF, nprobe=len(parts))
        assert empty.count() == 0
        # NB: .to_pandas() on a 0-row Dataset drops columns (Ray quirk);
        # the Dataset schema is the contract
        assert empty.schema().names == ["qid", "vec_id", "sim", "rank"]
        empty_pq = ann.ivfpq_topk(SF, nprobe=len(parts))
        assert empty_pq.count() == 0
        assert empty_pq.schema().names == ["qid", "vec_id", "adist_ppm", "rank"]
    finally:
        for src, dst in hidden:
            shutil.move(src, dst)


def test_emb_near_dups_pathological_single_bucket(tmp_path):
    """Degenerate near-dup corpus: 50k identical vectors -> ONE IVF bucket
    where every pair matches. The chunked earlier-rows block scan must emit
    O(n) star edges with O(block^2) peak memory — the dense ``mn @ mn.T``
    this replaces would materialize a 20 GB similarity matrix here."""
    n = 50_000
    dim = 8
    vec = [1.0] + [0.5] * (dim - 1)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([vec] * n, pa.list_(pa.float64())),
            }
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    from hydro_raster_ray.text import ann

    got = ann.emb_near_dups(str(tmp_path)).to_pandas()
    assert len(got) == n
    assert (got["group_id"] == 0).all()
    assert got["vec_id"].to_list() == list(range(n))


def test_emb_near_dups_mega_bucket_chain(tmp_path):
    """Giant single bucket UNDER A CAPPED TASK BUDGET (max_bucket_rows far
    below the bucket size): the bounded block-chain path must produce the
    identical grouping (the first-earlier-match contract is partition-
    independent) while no task ever holds the whole bucket matrix. Mixes
    near-dup runs with isolated vectors so matches span block boundaries."""
    rng = np.arange(3000)
    dim = 8
    # 10 base directions; vec i is a tiny deterministic perturbation of
    # base (i % 10) — rows of the same base are near-dups (cos ~ 1), rows
    # of different bases are far (cos < threshold for orthogonal-ish bases)
    base = np.eye(dim)[rng % 10 % dim] + 0.01 * np.outer(rng % 7, np.ones(dim))
    emb = base / np.linalg.norm(base, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(rng, pa.int64()),
                "embedding": pa.array(emb.tolist(), pa.list_(pa.float64())),
            }
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    from hydro_raster_ray.text import ann, witness

    emb_df = pq.read_table(os.path.join(tmp_path, "embeddings.parquet")).to_pandas()
    want = witness.emb_near_dups_witness(emb_df)
    # capped: buckets over 400 rows go through the block chain
    got = ann.emb_near_dups(
        str(tmp_path), max_bucket_rows=400, block_rows=128
    ).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # uncapped control: same result through the map_groups path
    got2 = ann.emb_near_dups(str(tmp_path)).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want)


def test_emb_near_dups_matches_witness():
    from hydro_raster_ray.text import ann, witness

    got = ann.emb_near_dups(SF).to_pandas().reset_index(drop=True)
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    want = witness.emb_near_dups_witness(emb)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    # group ids are cluster minima
    assert (got.groupby("group_id")["vec_id"].min() == got["group_id"].unique()).all()


def test_ngram_dup_matches_scalar_witness():
    from hydro_raster_ray.text import ops, witness

    got = (
        ops.ngram_dup_stats(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = (
        witness.ngram_dup_witness(docs).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the op is meaningful on this fixture only if some window duplicates
    # exist and not all windows are duplicated
    assert 0 < int(want["dup_windows"].sum())
    assert int(want["dup_windows"].sum()) < int(want["total_windows"].sum())


def test_ngram_dup_synthetic_shared_span(tmp_path):
    """Hand-built corpus: docs 1 and 2 share an 8-token span; doc 3 is
    disjoint; doc 4 is a short (<window) exact duplicate of doc 5."""
    from hydro_raster_ray.text import ops, witness

    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(1, 6, dtype=np.int64),
            "text": [
                f"one two {span} three four",
                f"nine ten {span} eleven",
                "completely different words everywhere in this document here now",
                "tiny doc",
                "tiny doc",
            ],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(d / "documents.parquet"))
    got = (
        ops.ngram_dup_stats(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = witness.ngram_dup_witness(docs).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("doc_id")
    assert by.loc[1, "dup_windows"] == 1  # exactly the shared span window
    assert by.loc[2, "dup_windows"] == 1
    assert by.loc[3, "dup_windows"] == 0
    # short exact duplicates: one full-token-list window each, duplicated
    assert by.loc[4, "total_windows"] == 1 and by.loc[4, "dup_windows"] == 1
    assert by.loc[5, "dup_windows"] == 1


def test_minhash_join_fallback_paths_match_witness():
    """Force the shuffle-join formulations (zero broadcast budgets) — the
    at-scale fallbacks must produce the identical clusters as the
    broadcast fast paths and the scalar witness."""
    from hydro_raster_ray.text import ops, witness

    got = (
        ops.minhash_near_dups(
            SF, bucket_broadcast_budget=0, endpoint_broadcast_budget=0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = (
        witness.minhash_groups_witness(docs)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_pii_scrub_matches_hand_scrub(ray_session):
    """pii_scrub's per-source counts equal a scalar re-based scrub of the
    same injected corpus — counts AND chars_removed (span-sensitive)."""
    import re

    import pandas as pd

    from hydro_raster_ray.text import ops

    got = (
        ops.pii_scrub(SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    em, ph = re.compile(ops.PII_EMAIL_RE), re.compile(ops.PII_PHONE_RE)
    rows = []
    for _, r in docs.iterrows():
        t = r["text"]
        if r["doc_id"] % 7 == 0:
            t += f" contact: user{r['doc_id']}@example.com"
        if r["doc_id"] % 11 == 0:
            t += f" call 555-{1000 + r['doc_id'] % 9000}"
        clean = ph.sub("[PHONE]", em.sub("[EMAIL]", t))
        rows.append(
            (r["source"], len(em.findall(t)), len(ph.findall(t)),
             len(t) - len(clean))
        )
    want = (
        pd.DataFrame(rows, columns=["source", "n_emails", "n_phones",
                                    "chars_removed"])
        .groupby("source", as_index=False)
        .agg(n_docs=("n_emails", "size"), n_emails=("n_emails", "sum"),
             n_phones=("n_phones", "sum"),
             chars_removed=("chars_removed", "sum"))
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert (got["n_emails"].sum(), got["n_phones"].sum()) == (
        want["n_emails"].sum(), want["n_phones"].sum())
    for c in ("n_docs", "n_emails", "n_phones", "chars_removed"):
        assert got[c].tolist() == want[c].tolist(), c
    assert got["n_emails"].sum() > 0 and got["n_phones"].sum() > 0


def test_pii_scrub_span_semantics():
    """The regexes match exactly the intended spans on adjacent/edge
    cases — same answers from Python re (engine) and the documented
    patterns."""
    import re

    from hydro_raster_ray.text import ops

    em = re.compile(ops.PII_EMAIL_RE)
    ph = re.compile(ops.PII_PHONE_RE)
    t = "a.b+c@x-y.co, d@e.fg; call 555-0001x555-123 and 555-12345"
    assert em.findall(t) == ["a.b+c@x-y.co", "d@e.fg"]
    # 555-12345: RE2/re both match the first 4 digits (no backtracking diff)
    assert ph.findall(t) == ["555-0001", "555-1234"]


def test_repetition_stats_hand_cases(tmp_path):
    """Gopher repetition filters vs a per-doc Counter reference, including
    the degenerate shapes (single token, all-identical tokens, max-repeat
    2-gram, mixed case)."""
    from collections import Counter

    from hydro_raster_ray.text import ops

    docs = [
        "alpha beta gamma delta eps zeta eta theta iota kappa lam mu",
        "x",                                # single token: no 2-grams
        "spam spam spam spam spam",        # one token, one gram repeated
        "a b a b a b a b",                 # alternating: 'a b' dominates
        "The the THE tHe unique",          # case folding collapses
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = (
        ops.repetition_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, text in enumerate(docs):
        toks = text.lower().split()
        n = len(toks)
        dup = int(np.floor(10000.0 * (1.0 - len(set(toks)) / n)))
        grams = Counter(zip(toks, toks[1:]))
        t2 = (
            int(np.floor((10000.0 * max(grams.values())) / (n - 1)))
            if grams
            else 0
        )
        row = got.iloc[i]
        assert row["n_toks"] == n
        assert row["dup_tok_pm"] == dup, (i, row["dup_tok_pm"], dup)
        assert row["top2_pm"] == t2, (i, row["top2_pm"], t2)
        assert row["flagged"] == int(dup > 7000 or t2 > 2000)
    # the all-spam and alternating docs must be flagged, distinct doc not
    assert got["flagged"].tolist() == [0, 0, 1, 1, 1]


def test_stratified_sample_matches_hashlib_reference(tmp_path):
    """Distributed partial-top-k sampling == single-process hashlib ranking,
    under a batch split that forces the two-stage merge."""
    import hashlib as _hl

    from hydro_raster_ray.text import ops

    rng = np.random.default_rng(9)
    n = 400
    langs = np.array(["en", "fr", "es", "de"], dtype=object)[
        rng.integers(0, 4, n)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(["t"] * n, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = (
        ops.stratified_sample(str(tmp_path), k=3)
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    want = []
    for lg in np.unique(langs):
        ids = np.flatnonzero(langs == lg)
        keyed = sorted(
            ids, key=lambda i: (_hl.md5(str(i).encode()).hexdigest(), i)
        )[:3]
        want.extend((int(i), lg) for i in keyed)
    want = sorted(want, key=lambda t: (t[1], t[0]))
    assert list(zip(got["doc_id"].tolist(), got["lang"].tolist())) == want


def test_pack_chunks_scan_matches_reference(tmp_path):
    """Distributed ordered prefix-sum: concat-then-chunk packing equals a
    single-process cumsum regardless of input row order; covers empty
    docs (occupy their boundary chunk), exact chunk-boundary spans, and
    multi-chunk documents."""
    import re as _re

    from hydro_raster_ray.text import ops

    texts = {
        0: "a " * 100,            # 100 tokens
        1: "",                     # empty doc
        2: "b " * 28,             # crosses the 128-boundary at seq_len=64
        3: "word " * 300,         # spans several chunks
        4: "x",                    # single token
        5: "c " * 63,             # ends exactly at a chunk boundary
    }
    # shuffled row order: the scan must order by doc_id, not input order
    order = [3, 1, 5, 0, 4, 2]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([int(i) for i in order], pa.int64()),
                "text": pa.array([texts[i] for i in order], pa.string()),
            }
        ),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = (
        ops.pack_chunks(str(tmp_path), seq_len=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # single-process reference
    pat = _re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    n = {i: len(pat.findall(texts[i])) for i in texts}
    off = 0
    want = []
    for i in sorted(texts):
        first = off // 64
        last = (off + max(n[i], 1) - 1) // 64
        want.append((i, n[i], first, last, last - first + 1))
        off += n[i]
    assert list(map(tuple, got.to_numpy())) == want
    assert got["n_tokens"].sum() == off


def test_emb_quantize_properties(tmp_path):
    """int8 symmetric quantization: reconstruction error is bounded by
    half a quantization step per element, extrema saturate at exactly
    ±127, and all-zero vectors quantize to all zeros."""
    from hydro_raster_ray.text import ann

    rng = np.random.default_rng(7)
    dim = 16
    vecs = rng.normal(size=(20, dim)).astype(np.float32)
    vecs[5] = 0.0  # all-zero vector
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(20), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    got = (
        ann.emb_quantize(str(tmp_path))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    m = vecs.astype(np.float64)
    maxabs = np.abs(m).max(axis=1)
    np.testing.assert_array_equal(got["maxabs"].to_numpy(), maxabs)
    # zero vector: all outputs zero
    z = got.iloc[5]
    assert z["sum_q"] == z["sum_abs_q"] == z["n_sat"] == 0
    # every non-zero vector saturates at its extreme element
    assert (got["n_sat"].to_numpy()[np.r_[0:5, 6:20]] >= 1).all()
    # reconstruction bound: |x - q*maxabs/127| <= (maxabs/127)/2 per element
    safe = np.where(maxabs == 0, 1.0, maxabs)
    q = np.floor((m * 127.0) / safe[:, None] + 0.5)
    recon = q * (safe[:, None] / 127.0)
    step = safe / 127.0
    assert (np.abs(m - recon) <= step[:, None] / 2 + 1e-12).all()
    np.testing.assert_array_equal(got["sum_q"].to_numpy(), q.sum(axis=1))


def test_rarity_scores_hand_cases(tmp_path):
    """doc_rarity vs a per-doc dict reference: df counted over DISTINCT
    (doc, token) pairs, score = sum of 1_000_000 // df over the doc's
    distinct tokens; repeated tokens inside a doc count once; empty docs
    are dropped (SQL unnest parity)."""
    from collections import Counter

    from hydro_raster_ray.text import ops

    docs = [
        "apple banana apple cherry",     # 'apple' twice: counts once
        "banana durian",
        "Apple BANANA eggplant",         # case folding joins df('apple')=2
        "",                              # zero tokens: omitted from output
        "unique",                        # df=1 token: max per-token score
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = (
        ops.rarity_scores(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = Counter()
    per_doc = [set(d.lower().split()) for d in docs]
    for s in per_doc:
        df.update(s)
    assert df["apple"] == 2 and df["banana"] == 3 and df["unique"] == 1
    exp_ids = [i for i, s in enumerate(per_doc) if s]
    assert got["doc_id"].tolist() == exp_ids
    for _, row in got.iterrows():
        s = per_doc[int(row["doc_id"])]
        assert row["n_distinct"] == len(s)
        assert row["rarity_score"] == sum(1_000_000 // df[t] for t in s)


def test_emb_pq_properties(tmp_path):
    """Product quantization: codes in [0, k), err_ppm ≥ 0, Lloyd
    iterations never increase the total quantization error (k-means
    monotonicity), and the distributed stage matches the single-process
    witness exactly."""
    from hydro_raster_ray.text import ann, witness

    rng = np.random.default_rng(7)
    n, dim = 60, 8
    vecs = rng.normal(size=(n, dim)).round(3)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            "label": pa.array([0] * n, pa.int32()),
        }),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    emb = pd.DataFrame({"vec_id": range(n), "embedding": list(vecs)})
    m, k = 2, 4
    got = (
        ann.emb_pq(str(tmp_path), m=m, k=k, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = witness.pq_codes_witness(emb, m=m, k=k, iters=2)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    for s in range(m):
        assert got[f"c{s}"].between(0, k - 1).all()
    assert (got["err_ppm"] >= 0).all()
    e0 = witness.pq_codes_witness(emb, m=m, k=k, iters=0)["err_ppm"].sum()
    e2 = want["err_ppm"].sum()
    assert e2 <= e0
    # dim not divisible by m is rejected
    with pytest.raises(ValueError, match="not divisible"):
        ann.emb_pq(str(tmp_path), m=3)


def test_cluster_doc_stats_conservation():
    """Cross-modality join: every doc lands in exactly one cluster —
    totals must conserve the corpus, and per-cluster counts bound n_en."""
    import duckdb

    from hydro_raster_ray.text import ann

    got = ann.cluster_doc_stats(SF).to_pandas()
    n_docs, sum_chars = duckdb.sql(
        f"SELECT count(*), sum(n_chars) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()
    assert got["n_docs"].sum() == n_docs
    assert got["sum_chars"].sum() == sum_chars
    assert (got["n_en"] <= got["n_docs"]).all()
    assert got["centroid"].between(0, 7).all() and len(got) <= 8


def test_dedup_filter_semantics():
    """Survivors = unclustered docs + each cluster's min doc_id; survivor
    set must be disjoint from drops and cover the corpus with the groups."""
    import duckdb

    from hydro_raster_ray.text import ops

    groups = ops.minhash_near_dups(SF).to_pandas()
    kept = set(ops.dedup_filter(SF).to_pandas()["doc_id"])
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    drops = set(groups.loc[groups["doc_id"] != groups["group_id"], "doc_id"])
    assert kept.isdisjoint(drops)
    assert len(kept) + len(drops) == n_docs
    # every cluster representative survives
    assert set(groups["group_id"]).issubset(kept)


def test_decontaminate_hand_cases(tmp_path):
    """Decontamination: a doc sharing a full window with the eval set is
    flagged with the right hit count; disjoint docs are clean; eval docs
    and empty docs are excluded; short docs hash as one whole-doc window."""
    from hydro_raster_ray.text import ops

    ev = "w1 w2 w3 w4 w5 w6 w7 w8 w9"          # eval doc: 2 windows of 8
    docs = [
        ev,                                      # doc 0: the eval doc
        "x0 w1 w2 w3 w4 w5 w6 w7 w8 x1",        # shares window 1 (not 2)
        "a b c d e f g h i j",                   # disjoint: 3 windows, 0 hits
        "w1 w2 w3",                              # short: 1 whole-doc window, no hit
        "",                                      # empty: excluded
        "w2 w3 w4 w5 w6 w7 w8 w9",              # exactly eval window 2
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = (
        ops.decontaminate(str(tmp_path), eval_doc_ids=(0,), window=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == [1, 2, 3, 5]      # 0 is eval, 4 empty
    assert got.loc[1, "n_windows"] == 3 and got.loc[1, "n_hits"] == 1
    assert got.loc[1, "contaminated"] == 1
    assert got.loc[2, "n_hits"] == 0 and got.loc[2, "contaminated"] == 0
    assert got.loc[3, "n_hits"] == 0            # whole-doc window ≠ any 8-gram
    assert got.loc[5, "n_windows"] == 1 and got.loc[5, "n_hits"] == 1


def test_rarity_join_path_matches_broadcast():
    """The open-vocabulary hash-join path (broadcast_budget=0) must produce
    exactly the broadcast path's rows."""
    from hydro_raster_ray.text import ops

    a = (
        ops.rarity_scores(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        ops.rarity_scores(SF, broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)


def test_ivfpq_topk_matches_witness_and_overlaps_exact():
    """IVF-PQ ADC search: bit-parity with the scalar witness at a second
    scale (the oracle gates sf0.01), ranks ascend by quantized distance,
    and the compressed-domain top-10 keeps a sane overlap with the exact
    brute-force cosine top-10 (quantization is lossy but not random)."""
    import pyarrow.parquet as _pq

    from hydro_raster_ray.text import ann, witness

    got = (
        ann.ivfpq_topk(SF)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    emb = _pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    want = witness.ivfpq_topk_witness(emb).sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    for _, g in got.groupby("qid"):
        assert (np.diff(g["adist_ppm"].to_numpy()) >= 0).all()
    # apples-to-apples recall: exact L2 within the SAME probed bucket
    # (ADC approximates L2 — cosine overlap is the wrong yardstick)
    mat = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()).astype(
        np.float64
    )
    ids = np.sort(emb["vec_id"].to_numpy())
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bucket = ids[:8][np.argmax(mn @ mn[:8].T, axis=1)]
    for qid, g in got.groupby("qid"):
        qi = int(np.searchsorted(ids, qid))
        probed = ids[:8][int(np.argmax(mn[qi] @ mn[:8].T))]
        keep = (bucket == probed) & (ids != qid)
        d = ((mat[keep] - mat[qi]) ** 2).sum(axis=1)
        exact10 = set(ids[keep][np.lexsort((ids[keep], d))[:10]])
        # fixture embeddings are near-isotropic and the demo codebook is
        # deliberately tiny (m=4, kpq=16 → 16 cells per 16-dim subspace),
        # so absolute recall is modest; random 10-of-|bucket| overlap
        # expectation here is <2 — assert clearly above chance
        assert len(set(g["vec_id"]) & exact10) >= 2


def test_cms_point_queries_bound_true_counts():
    """Count-Min guarantees: est(tok) ≥ true count for every token, and
    with width=1024 ≫ vocab the fixture corpus should estimate the
    stopword counts exactly (no collisions among ~40 tokens is the
    overwhelmingly likely draw; equality failure would mean the sketch
    arithmetic drifted)."""
    import duckdb

    from hydro_raster_ray.text import ops

    counters = ops.token_cms(SF).to_pandas()
    true = dict(
        duckdb.sql(
            f"""SELECT tok, count(*) FROM (
                  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) tok
                  FROM read_parquet('{SF}/documents.parquet')) GROUP BY tok"""
        ).fetchall()
    )
    est = ops.cms_estimate(counters, list(true))
    assert all(est[t] >= c for t, c in true.items())
    total = counters["cnt"].sum() // 4  # each occurrence counted once/row
    assert total == sum(true.values())
    exact = sum(1 for t, c in true.items() if est[t] == c)
    assert exact >= 0.9 * len(true)


def test_dedup_filter_no_clusters_returns_everyone(tmp_path):
    """All-unique corpus: zero near-dup clusters → every doc survives
    (exercises the empty-drop-list short-circuit; a zero-block join side
    aborts Ray's hash join)."""
    from hydro_raster_ray.text import ops

    docs = [f"totally unique document number {i} with words {i*7} {i*13}"
            for i in range(20)]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    out = ops.dedup_filter(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(20))


def test_lm_surprisal_hand_case(tmp_path):
    """doc_lm_surprisal vs pencil arithmetic: add-one bigram model,
    integer surprise = ((c1 + V) * 1e6) // (c12 + 1) summed over bigram
    INSTANCES (repeats score every time, unlike rarity's distinct
    tokens); <2-token docs drop (SQL shifted-slice unnest parity)."""
    from hydro_raster_ray.text import ops

    docs = ["a b a b c", "b c d", "x", ""]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = (
        ops.lm_surprisal_scores(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # V = |{a,b,c,d,x}| = 5; c12: ab=2 ba=1 bc=2 cd=1; c1: a=2 b=3 c=1
    s_ab = ((2 + 5) * 1_000_000) // (2 + 1)   # 2333333
    s_ba = ((3 + 5) * 1_000_000) // (1 + 1)   # 4000000
    s_bc = ((3 + 5) * 1_000_000) // (2 + 1)   # 2666666
    s_cd = ((1 + 5) * 1_000_000) // (1 + 1)   # 3000000
    assert got["doc_id"].tolist() == [0, 1]   # 'x' and '' emit no bigram
    assert got["n_bigrams"].tolist() == [4, 2]
    assert got["lm_surprisal"].tolist() == [
        2 * s_ab + s_ba + s_bc, s_bc + s_cd]


def test_lm_surprisal_join_path_matches_broadcast():
    """The open-bigram-vocabulary hash-join path (broadcast_budget=0)
    must produce exactly the broadcast path's rows."""
    from hydro_raster_ray.text import ops

    a = (
        ops.lm_surprisal_scores(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    b = (
        ops.lm_surprisal_scores(SF, broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)


def test_semdedup_hand_case(tmp_path):
    """SemDeDup vs pencil assignment: seeds = first 8 vectors; a planted
    near-copy of seed 2 (cos ≈ 0.9998 > 0.44) is dropped while its
    lower-id twin survives; an in-cluster but dissimilar vector keeps."""
    from hydro_raster_ray.text import ann

    rng = np.random.default_rng(11)
    dim = 8
    seeds = rng.normal(size=(8, dim))
    # orthogonalize-ish so assignments are unambiguous
    seeds = seeds / np.linalg.norm(seeds, axis=1, keepdims=True)
    near2 = seeds[2] + 0.01 * rng.normal(size=dim)      # vec 8: dup of seed 2
    far2 = seeds[2] * 0.3 + 0.29 * seeds[2][::-1]       # vec 9: same-ish dir?
    vecs = np.vstack([seeds, near2, far2])
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array(list(vecs.astype(np.float32).astype(np.float64)),
                                  pa.list_(pa.float64())),
            "label": pa.array([0] * 10, pa.int32()),
        }),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    got = (
        ann.semdedup(str(tmp_path))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # reference: same math scalar-side
    mn = vecs.astype(np.float32).astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    best = np.argmax(mn @ mn[:8].T, axis=1)
    assert got["centroid"].tolist() == best.tolist()
    kept = []
    for c in range(8):
        idx = np.nonzero(best == c)[0]
        sub = mn[idx]
        tri = np.triu(sub @ sub.T, k=1) > 0.44
        k = ~tri.any(axis=0)
        kept.extend(zip(idx, k))
    want = [int(k) for _, k in sorted(kept)]
    assert got["kept"].tolist() == want
    # the planted near-dup must actually exercise the drop branch
    assert got.loc[got["vec_id"] == 8, "kept"].item() == 0
    assert got.loc[got["vec_id"] == 2, "kept"].item() == 1


@pytest.mark.parametrize("seed", [3, 17, 92])
def test_lm_surprisal_random_corpus_duckdb_parity(tmp_path, seed):
    """Engine vs an independent DuckDB evaluation of the same integer
    bigram-surprisal definition on seeded random corpora with shared
    phrases (repeated bigrams across docs), empty docs and single-token
    docs — the randomized complement of the pencil hand-case."""
    import duckdb

    from hydro_raster_ray.text import ops

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    phrases = [" ".join(rng.choice(vocab, 4)) for _ in range(6)]
    docs = []
    for i in range(40):
        parts = [phrases[j] for j in rng.integers(0, 6, rng.integers(1, 4))]
        parts += list(rng.choice(vocab, rng.integers(0, 5)))
        docs.append(" ".join(parts))
    docs += ["", "solo", phrases[0]]
    path = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        path,
    )
    got = (
        ops.lm_surprisal_scores(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH tk AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\\S+') t
          FROM read_parquet('{path}')),
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
        FROM pairs p CROSS JOIN v
        JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
        JOIN ctx ON ctx.w1 = p.w1
        GROUP BY p.doc_id ORDER BY p.doc_id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_lsh_topk_contract():
    """LSH-bucketed ANN laws: every hit's bucket word is within Hamming-1
    of its query's bucket (scalar recompute of the sign bits); sims/ranks
    are a correctly-ordered subset of the brute-force candidate ranking;
    self never appears."""
    from hydro_raster_ray.text import ann

    got = ann.lsh_topk(SF).to_pandas()
    assert len(got) > 0 and (got["vec_id"] != got["qid"]).all()
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    P = M[ids < 8]
    buckets = ((M @ P.T) > 0) @ (1 << np.arange(8, dtype=np.int64))
    bucket_of = dict(zip(ids.tolist(), buckets.tolist()))
    pop = np.array([bin(i).count("1") for i in range(256)])
    for _, r in got.iterrows():
        assert pop[bucket_of[r["vec_id"]] ^ bucket_of[r["qid"]]] <= 1
    # ordering law within each query
    for qid, g in got.groupby("qid"):
        g = g.sort_values("rank")
        keys = list(zip(-g["sim"].to_numpy(), g["vec_id"].to_numpy()))
        assert keys == sorted(keys)
        assert g["rank"].tolist() == list(range(1, len(g) + 1))


def _write_docs(tmp_path, texts, langs=None, n_chars=None, sources=None):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs or ["en"] * n),
        "source": pa.array(sources or ["t"] * n),
        "n_chars": pa.array(n_chars or [len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_cooccurrence_hand_case(tmp_path):
    """Pencil pairs over 'a b a c' with window=3: distance-1 pairs
    (a,b),(a,b),(a,c); distance-2 pairs (a,a),(b,c). Pair order is
    lexicographic, counting includes same-token pairs, and no pair
    crosses a document boundary."""
    from hydro_raster_ray.text.ops import cooccurrence_topk

    sf = _write_docs(tmp_path, ["a B a c", "x"])
    got = cooccurrence_topk(sf, window=3, k=10).to_pandas()
    pairs = {(r.tok_a, r.tok_b): r.n_pair for r in got.itertuples()}
    assert pairs == {("a", "b"): 2, ("a", "c"): 1, ("a", "a"): 1,
                     ("b", "c"): 1}
    # top-1 is the count-2 pair; ties broken by (tok_a, tok_b)
    assert got.iloc[0][["tok_a", "tok_b"]].tolist() == ["a", "b"]
    assert got["n_pair"].dtype == np.int64


def test_len_quantiles_hand_case(tmp_path):
    """Type-1 rank arithmetic: n=4 lengths [10,20,30,40] → p25=10 (rank
    ceil(1)=1), p50=20, p75=30, p90=40 (rank ceil(3.6)=4); a 1-doc
    language returns its single length for every quantile."""
    from hydro_raster_ray.text.ops import len_quantiles_by_lang

    sf = _write_docs(
        tmp_path, ["x"] * 5, langs=["en"] * 4 + ["fr"],
        n_chars=[30, 10, 40, 20, 7],
    )
    got = (
        len_quantiles_by_lang(sf).to_pandas()
        .sort_values("lang").reset_index(drop=True)
    )
    en = got[got["lang"] == "en"].iloc[0]
    assert [en.p25, en.p50, en.p75, en.p90] == [10, 20, 30, 40]
    assert en.n_docs == 4
    fr = got[got["lang"] == "fr"].iloc[0]
    assert [fr.p25, fr.p50, fr.p75, fr.p90] == [7, 7, 7, 7]


def test_url_domains_injection_and_topk(tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.text.ops import url_domains

    # doc 0: %3 and %10 -> host0.example.org AND cdn0.example.net
    # doc 3: %3 -> host3.example.org ; doc 1: nothing injected but carries
    # a literal URL of its own; doc 2: nothing
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta",
            "see https://manual.example.com/x page",
            "gamma",
            "delta",
        ]),
    }), os.path.join(tmp_path, "documents.parquet"))
    got = url_domains(str(tmp_path), k=10).to_pandas()
    m = dict(zip(got["domain"], got["n_urls"]))
    assert m == {
        "host0.example.org": 1,
        "cdn0.example.net": 1,
        "host3.example.org": 1,
        "manual.example.com": 1,
    }
    # total order: n_urls DESC then domain ASC
    assert got["domain"].tolist() == sorted(got["domain"].tolist())
    assert got["n_docs"].tolist() == [1, 1, 1, 1]


def test_events_cumulative_distinct_first_seen(tmp_path):
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.pipelines.relational import (
        events_cumulative_distinct,
    )

    rows = [
        # user, ts          (user 1 spans 3 days -> counted on day 1 only)
        (1, "2024-01-01 09:00:00"),
        (1, "2024-01-02 09:00:00"),
        (1, "2024-01-03 09:00:00"),
        (2, "2024-01-02 10:00:00"),
        (2, "2024-01-02 11:00:00"),
        (3, "2024-01-03 00:00:00"),
        (4, "2024-01-03 23:59:59"),
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
    }), os.path.join(tmp_path, "events.parquet"))
    got = events_cumulative_distinct(str(tmp_path)).to_pandas()
    assert [d.strftime("%Y-%m-%d") for d in got["day"]] == [
        "2024-01-01", "2024-01-02", "2024-01-03"]
    assert got["new_users"].tolist() == [1, 1, 2]
    assert got["cum_users"].tolist() == [1, 2, 4]


def test_heavy_hitters_pencil_and_guard(tmp_path):
    """Pencil: counts a=7, b=5, c=3, d=1 → top-3 exact. With sketch_k=1
    the MG guard (k-th count vs total decrements) must still deliver the
    EXACT answer via the fallback path — correctness is unconditional."""
    from hydro_raster_ray.text import ops

    d = _write_docs(
        tmp_path, ["a a a b b c", "a a b b c a", "a b c d"])
    for sk in (1, 2, 200):  # degenerate sketch → fallback; big → sketch path
        got = ops.heavy_hitters(d, k=3, sketch_k=sk).to_pandas()
        assert got["tok"].tolist() == ["a", "b", "c"], (sk, got)
        assert got["n"].tolist() == [7, 5, 3]


def test_heavy_hitters_tie_break(tmp_path):
    """Equal counts order lexicographically at the k boundary."""
    from hydro_raster_ray.text import ops

    d = _write_docs(tmp_path, ["x y z", "x y z", "w w w"])
    got = ops.heavy_hitters(d, k=2).to_pandas()
    assert got["tok"].tolist() == ["w", "x"]
    assert got["n"].tolist() == [3, 2]


def test_tfidf_top_terms_pencil(tmp_path):
    """Two sources: 'common' appears in both (df=2 → idf 500000),
    'rare' only in s0 (df=1 → idf 1000000). s0: tf(rare)=2 → 2000000
    beats tf(common)=3 → 1500000."""
    from hydro_raster_ray.text import ops

    d = _write_docs(
        tmp_path,
        ["common rare rare common common", "common common"],
        sources=["s0", "s1"],
    )
    got = ops.tfidf_top_terms(d, k=2).to_pandas().sort_values(
        ["source", "rk"]).reset_index(drop=True)
    s0 = got[got["source"] == "s0"]
    assert s0["tok"].tolist() == ["rare", "common"]
    assert s0["score"].tolist() == [2_000_000, 1_500_000]
    s1 = got[got["source"] == "s1"]
    assert s1["tok"].tolist() == ["common"]
    assert s1["score"].tolist() == [1_000_000]


def test_bm25_pencil(tmp_path):
    """Hand-computed: docs ['q q x', 'x y', 'q x y z'], query 'q'.
    D=3, T=9, df(q)=2 → idf_fp = 1e6·(2·1+1)//(2·2+1) = 600000.
    doc0: tf=2, dl=3 → (600000·4·2·9)//(2·9·2 + 9 + 3·3) = 43200000//54
        = 800000.
    doc2: tf=1, dl=4 → (600000·4·1·9)//(18 + 9 + 12) = 21600000//39
        = 553846. Ranking: doc0 > doc2; doc1 omitted (no hit)."""
    from hydro_raster_ray.text import ops

    d = _write_docs(tmp_path, ["q q x", "x y", "q x y z"])
    got = ops.bm25_topk(d, query="q", k=10).to_pandas()
    assert got["doc_id"].tolist() == [0, 2]
    assert got["score"].tolist() == [800000, 553846]
    assert got["n_hit"].tolist() == [1, 1]


def test_bm25_multi_term_and_boundary_order(tmp_path):
    """Two query terms sum per doc; equal scores tie-break by doc_id."""
    from hydro_raster_ray.text import ops

    d = _write_docs(tmp_path, ["m n", "m n", "zz"])
    got = ops.bm25_topk(d, query="m n", k=2).to_pandas()
    assert got["doc_id"].tolist() == [0, 1]
    assert got["n_hit"].tolist() == [2, 2]
    assert got["score"].iloc[0] == got["score"].iloc[1]


def test_jl_project_pencil(tmp_path):
    """Scalar reproduction of the sign formula on a 4-dim embedding, and
    a degeneracy check: the prime-modulus signs must NOT be the parity
    checkerboard (which would make dims j and j+2 identical)."""
    from hydro_raster_ray.text import ann

    emb = [[1.0, 2.0, 3.0, 4.0], [0.5, -0.5, 0.25, -0.25]]
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array([0, 1], pa.int64()),
        }),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    got = ann.jl_project(str(tmp_path), k=4).to_pandas().sort_values(
        ["vec_id", "dim"]).reset_index(drop=True)

    def sgn(i, j):
        return 1.0 if (i * 2654435761 + j * 40503) % 97 < 48 else -1.0

    # degeneracy check at the REAL embedding width: a parity-checkerboard
    # sign scheme (the mod-2 trap) would make columns j and j+2 identical
    # for ALL i — the prime modulus must not (4-row coincidences are fine)
    big = np.array([[sgn(i, j) for j in range(4)] for i in range(1, 65)])
    assert not np.array_equal(big[:, 0], big[:, 2])
    assert not np.array_equal(big[:, 1], big[:, 3])

    signs = np.array([[sgn(i, j) for j in range(4)] for i in range(1, 5)])
    x = np.array(emb, np.float32).astype(np.float64)
    want = np.round(x @ signs / 2.0, 6)
    np.testing.assert_allclose(
        got["v"].to_numpy().reshape(2, 4), want, atol=1e-12)


def test_hard_negatives_pencil(tmp_path):
    """Hand case: v0 (label 0) vs {v1: identical direction but label 0 —
    excluded; v2: label 1, sim 1.0 (same direction); v3: label 1,
    orthogonal}. Hardest negative of v0 is v2 with sim 1.0; of v3 it is
    v0 or v2 equally (sim 0.0) → tie breaks to the SMALLEST id (v0)."""
    from hydro_raster_ray.text import ann

    emb = [[1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [0.0, 1.0]]
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array([0, 0, 1, 1], pa.int64()),
        }),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    got = ann.hard_negatives(str(tmp_path)).to_pandas()
    by = {int(r.vec_id): (int(r.neg_id), float(r.sim))
          for r in got.itertuples()}
    assert by[0] == (2, 1.0)
    assert by[1] == (2, 1.0)
    assert by[2][0] == 0 and by[2][1] == 1.0  # tie v0/v1 → min id
    assert by[3][0] == 0 and by[3][1] == 0.0  # orthogonal ties → min id


def test_ivf_recall_bounds_and_nprobe_monotone():
    """recall@k is in [0, 1e6] ppm, and probing MORE buckets can only
    help: recall(nprobe=2) >= recall(nprobe=1) per query (the IVF scan
    set grows monotonically)."""
    from hydro_raster_ray.text import ann

    r1 = ann.ivf_recall(SF, nprobe=1).to_pandas().set_index("qid")
    r2 = ann.ivf_recall(SF, nprobe=2).to_pandas().set_index("qid")
    assert ((r1["recall_ppm"] >= 0) & (r1["recall_ppm"] <= 1_000_000)).all()
    assert (r2["recall_ppm"] >= r1["recall_ppm"]).all()
    assert (r1["n_hit"] * 100_000 == r1["recall_ppm"]).all()
