"""Training-data pipeline operators over the documents/embeddings tables.

The large-scale data-curation operators a 100 TB training pipeline needs,
each expressed Ray-Data-first (map_batches + bucketed groupby — the same
one-shuffle pattern as the rollup cascade):

- exact dedup           content-hash partition → per-group winner
- n-gram Jaccard dedup  bigram inverted index → pair counts → exact J
- MinHash + LSH dedup   shingle→minhash→band→bucket → verify candidates
- SimHash dedup         64-bit simhash, banded hamming candidates
- ANN similarity        brute-force cosine top-k vs a broadcast query
                        (numpy matmul per batch); LSH-bucketed near-dup
- text analysis         token stats, language-ID heuristic, quality
                        scoring, winnowing fingerprints

Each op with SQL-expressible semantics has a DuckDB oracle in ORACLES
(driver hash-checks values); approximate/heuristic ops (minhash, simhash,
lang-id, fingerprints) are registered without oracles → rows-only checks,
with exactness cross-checks in tests/test_training.py instead.

Scale notes: every pairwise op keys its shuffle on a content bucket so
hot shingles / hot hash prefixes spread; the only broadcast is the ANN
query matrix (ray.put once, read per actor); nothing materializes the
corpus on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data as rd

JACCARD_TAU = 0.3
COSINE_TAU = 0.45
ANN_K = 10
NUM_BUCKETS = 32

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _read_docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _bigrams(text: str) -> list[str]:
    toks = text.split(" ")
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_of_str(values, num=NUM_BUCKETS) -> np.ndarray:
    return np.fromiter(
        ((_hash64(v) % num) for v in values), dtype=np.int32, count=len(values)
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: one surviving doc (min doc_id) per distinct text.

    Plan: content-hash per row → hash-bucket shuffle → per-bucket
    vectorized groupby.  At 100 TB the only data moved is
    (hash, doc_id) pairs, never text.
    """
    ds = _read_docs(sf_dir)

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].map(_md5_hex)
        return pd.DataFrame(
            {
                "h": h,
                "doc_id": df["doc_id"],
                "bucket": _bucket_of_str(h),
            }
        )

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False).agg(
            doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )
        return g.reset_index()

    out = (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("bucket")
        .map_groups(winners, batch_format="pandas")
        .to_pandas()
    )
    out["n_dups"] = out["n_dups"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)[["h", "doc_id", "n_dups"]]


# ---------------------------------------------------------------------------
# token stats (SQL-oracled text analysis)
# ---------------------------------------------------------------------------


def q_token_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": toks.map(len).astype(np.int64),
                "n_unique_tokens": toks.map(lambda t: len(set(t))).astype(np.int64),
            }
        )

    return (
        ds.map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# n-gram (bigram) Jaccard dedup — exact, inverted-index plan
# ---------------------------------------------------------------------------


def _jaccard_pairs_from_ds(ds, tau: float) -> pd.DataFrame:
    """Exact all-pairs Jaccard >= tau over distinct word-bigram sets.

    Plan (3 stages, 2 shuffles, no driver materialization):
      1. doc → distinct shingles, rows (sh, doc_id, n_doc) — n_doc rides
         along so no broadcast of a sizes table is ever needed;
      2. groupby shingle-hash bucket → per-shingle pair emission
         (a, b, na, nb, 1);
      3. groupby pair bucket → sum intersections → J = c/(na+nb-c) → filter.
    Hot shingles (document-frequency explosion) would be capped by a
    max_df knob at real scale; left uncapped here for oracle exactness.
    """

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows_sh, rows_doc, rows_n = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            shs = set(_bigrams(text))
            for sh in shs:
                rows_sh.append(sh)
                rows_doc.append(doc_id)
                rows_n.append(len(shs))
        out = pd.DataFrame(
            {"sh": rows_sh, "doc_id": rows_doc, "n_doc": np.array(rows_n, dtype=np.int64)}
        )
        out["bucket"] = _bucket_of_str(out["sh"])
        return out

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("sh", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            ns = g["n_doc"].to_numpy()
            iu, ju = np.triu_indices(len(ids), k=1)
            outs.append(
                pd.DataFrame(
                    {"a": ids[iu], "b": ids[ju], "na": ns[iu], "nb": ns[ju]}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                 "na": pd.Series(dtype=np.int64), "nb": pd.Series(dtype=np.int64)}
            )
        out = pd.concat(outs, ignore_index=True)
        h = (
            out["a"].to_numpy(dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ out["b"].to_numpy(dtype=np.uint64)
        )
        out["pbucket"] = (h % np.uint64(NUM_BUCKETS)).astype(np.int32)
        return out

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["a", "b"], sort=False)
            .agg(c=("na", "size"), na=("na", "first"), nb=("nb", "first"))
            .reset_index()
        )
        j = g["c"] / (g["na"] + g["nb"] - g["c"])
        g["j"] = j.round(6)
        return g.loc[j >= tau, ["a", "b", "j"]]

    out = (
        ds.map_batches(shingle_rows, batch_format="pandas")
        .groupby("bucket")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(reduce_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "j": pd.Series(dtype=np.float64)}
        )
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    return _jaccard_pairs_from_ds(_read_docs(sf_dir), JACCARD_TAU)


# ---------------------------------------------------------------------------
# MinHash + LSH dedup (approximate candidates, exact verification)
# ---------------------------------------------------------------------------

_MH_PERMS = 128
_MH_BANDS = 32  # 32 bands x 4 rows: catches J>=0.3 with high recall
_MH_PRIME = (1 << 61) - 1


def _minhash_params(seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MH_PRIME, size=_MH_PERMS, dtype=np.int64).astype(object)
    b = rng.integers(0, _MH_PRIME, size=_MH_PERMS, dtype=np.int64).astype(object)
    return a, b


class MinHasher:
    """Actor-pool stage: per-doc shingle set → 128 minhashes → LSH band
    rows.  Permutation parameters built once per actor (__init__), the
    per-batch work is vectorized numpy."""

    def __init__(self):
        self.a, self.b = _minhash_params()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "band_hash": [], "doc_id": [], "n_doc": []}
        a = np.array(self.a, dtype=np.uint64)
        b = np.array(self.b, dtype=np.uint64)
        for doc_id, text in zip(df["doc_id"], df["text"]):
            shs = set(_bigrams(text))
            if not shs:
                continue
            hv = np.fromiter(
                (_hash64(s) for s in shs), dtype=np.uint64, count=len(shs)
            )
            # (a*h + b) mod 2^64 universal-ish hashing, vectorized:
            # matrix perms x shingles via outer broadcast, then min
            m = (hv[None, :] * a[:, None] + b[:, None]).min(axis=1)
            bands = m.reshape(_MH_BANDS, -1)
            for bi in range(_MH_BANDS):
                bh = hashlib.md5(bands[bi].tobytes()).hexdigest()[:16]
                rows["band"].append(bi)
                rows["band_hash"].append(bh)
                rows["doc_id"].append(doc_id)
                rows["n_doc"].append(len(shs))
        return pd.DataFrame(rows)


def q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH candidate pairs verified with exact Jaccard >= tau.

    The verification joins candidate pairs back to shingle sets by
    re-reading the docs (broadcast here — at scale the verify is another
    bucket shuffle keyed on doc_id).  Output shape matches
    q_jaccard_pairs; recall is checked against it in tests.
    """
    ds = _read_docs(sf_dir)
    band_rows = ds.map_batches(
        MinHasher, batch_format="pandas", batch_size=1024, concurrency=2
    )

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g["doc_id"].to_numpy())
            iu, ju = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({"a": ids[iu], "b": ids[ju]}))
        if not out:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        return pd.concat(out, ignore_index=True).drop_duplicates()

    def add_band_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = _bucket_of_str(df["band_hash"])
        return df

    cand = (
        band_rows.map_batches(add_band_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )
    if cand.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "j": pd.Series(dtype=np.float64)}
        )

    # exact verification (small side broadcast: doc_id → shingle set)
    docs = _read_docs(sf_dir).to_pandas()
    sets = {d: set(_bigrams(t)) for d, t in zip(docs["doc_id"], docs["text"])}
    j = []
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        j.append(round(inter / (len(sa) + len(sb) - inter), 6))
    cand = cand.assign(j=j)
    cand = cand[cand["j"] >= JACCARD_TAU]
    cand["a"] = cand["a"].astype(np.int64)
    cand["b"] = cand["b"].astype(np.int64)
    return cand.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash dedup
# ---------------------------------------------------------------------------


def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for t in set(tokens):
        h = _hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def q_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per doc (over word bigrams) + hamming-candidate
    pairs <= 3 bits via 4-way band pigeonhole."""
    ds = _read_docs(sf_dir)

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        vals = [_simhash64(_bigrams(t)) for t in df["text"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": [f"{v:016x}" for v in vals],
            }
        )

    return (
        ds.map_batches(sh, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# language-ID heuristic + quality scoring (rows-only)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que"},
}


class LangQuality:
    """Actor-pool text-analysis stage: stopword tables + marker sets are
    actor state; scoring is per-batch pandas."""

    def __init__(self):
        self.markers = _LANG_MARKERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds, quals = [], []
        for text in df["text"]:
            toks = text.split(" ")
            low = [t.lower() for t in toks]
            ls = set(low)
            best, best_n = "en", 0
            for lang, markers in self.markers.items():
                n = len(ls & markers)
                if n > best_n:
                    best, best_n = lang, n
            if any("一" <= ch <= "鿿" for ch in text):
                best = "zh"
            preds.append(best)
            n_tok = max(len(toks), 1)
            mean_len = sum(len(t) for t in toks) / n_tok
            uniq_ratio = len(ls) / n_tok
            punct = sum(not ch.isalnum() and not ch.isspace() for ch in text)
            punct_ratio = punct / max(len(text), 1)
            # simple bounded quality score: favors diverse, word-sized
            # tokens with little punctuation
            q = (
                min(n_tok / 100.0, 1.0) * 0.3
                + uniq_ratio * 0.3
                + max(0.0, 1.0 - abs(mean_len - 5.0) / 5.0) * 0.2
                + max(0.0, 1.0 - punct_ratio * 5) * 0.2
            )
            quals.append(round(q, 6))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": preds, "quality": quals}
        )


def q_lang_quality(sf_dir: str) -> pd.DataFrame:
    return (
        _read_docs(sf_dir)
        .map_batches(LangQuality, batch_format="pandas", batch_size=1024, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rows-only)
# ---------------------------------------------------------------------------


def q_fingerprints(sf_dir: str, k: int = 5, w: int = 4) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    k-gram rolling hashes, per-window minimum selection."""
    ds = _read_docs(sf_dir)

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        n_fps, fp_hash = [], []
        for text in df["text"]:
            toks = text.split(" ")
            grams = [" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))]
            hs = [_hash64(g) for g in grams]
            picks = set()
            for i in range(max(len(hs) - w + 1, 0)):
                window = hs[i : i + w]
                picks.add(min(range(len(window)), key=lambda j: window[j]) + i)
            fps = sorted(hs[i] for i in picks)
            n_fps.append(len(fps))
            fp_hash.append(
                hashlib.md5(np.array(fps, dtype=np.uint64).tobytes()).hexdigest()[:16]
            )
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_fingerprints": np.array(n_fps, dtype=np.int64),
             "fp_hash": fp_hash}
        )

    return (
        ds.map_batches(fp, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# embeddings: ANN top-k + cosine near-dup
# ---------------------------------------------------------------------------


def _read_emb(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-k against one query vector (vec_id = min).

    The scale pattern: normalize + matmul per batch against the
    broadcast query matrix (ray.put once), local top-k per batch, tiny
    global reduce.  An IVF/LSH variant for huge corpora is
    q_embed_neardup's bucketing."""
    emb = _read_emb(sf_dir)
    qrow = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .sort("vec_id")
        .limit(1)
        .to_pandas()
    )
    qid = int(qrow["vec_id"].iloc[0])
    qv = np.asarray(qrow["embedding"].iloc[0], dtype=np.float64)
    qv /= np.linalg.norm(qv)
    qref = ray.put(qv)

    def topk_batch(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        sim = M @ q
        out = pd.DataFrame({"vec_id": df["vec_id"], "sim": np.round(sim, 6)})
        out = out[out["vec_id"] != qid]
        return out.sort_values(["sim", "vec_id"], ascending=[False, True]).head(ANN_K)

    out = emb.map_batches(topk_batch, batch_format="pandas").to_pandas()
    out = out.sort_values(["sim", "vec_id"], ascending=[False, True]).head(ANN_K)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out.reset_index(drop=True)


def q_embed_neardup(sf_dir: str) -> pd.DataFrame:
    """All-pairs cosine >= tau via batch x broadcast-matrix matmul.

    The full normalized matrix is broadcast (ray.put) — right-sized for
    dimension tables; at true 100 TB scale swap in the hyperplane-LSH
    bucket shuffle (same bucket pattern as the Jaccard pipeline)."""
    emb = _read_emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    mref = ray.put((ids, M))

    ds = _read_emb(sf_dir)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, allM = ray.get(mref)
        B = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        bids = df["vec_id"].to_numpy(dtype=np.int64)
        S = B @ allM.T
        bi, aj = np.nonzero(np.round(S, 6) >= COSINE_TAU)
        a = bids[bi]
        b = all_ids[aj]
        keep = a < b
        return pd.DataFrame(
            {"a": a[keep], "b": b[keep], "sim": np.round(S[bi, aj][keep], 6)}
        )

    out = ds.map_batches(pairs, batch_format="pandas").to_pandas()
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "jaccard_pairs": q_jaccard_pairs,
    "minhash_pairs": q_minhash_pairs,  # rows-only (approx candidates)
    "simhash": q_simhash,  # rows-only (hash definition is ours)
    "lang_quality": q_lang_quality,  # rows-only (heuristic)
    "fingerprints": q_fingerprints,  # rows-only (winnowing params ours)
    "ann_topk": q_ann_topk,
    "embed_neardup": q_embed_neardup,
}

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS h, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        FROM documents GROUP BY md5(text) ORDER BY doc_id
    """,
    "token_stats": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_unique_tokens
        FROM documents ORDER BY doc_id
    """,
    "jaccard_pairs": f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS ord
            FROM documents
        ),
        bi AS (
            SELECT a.doc_id, a.tok || ' ' || b.tok AS sh
            FROM toks a JOIN toks b USING (doc_id)
            WHERE b.ord = a.ord + 1
        ),
        bid AS (SELECT DISTINCT doc_id, sh FROM bi),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM bid GROUP BY doc_id),
        inter AS (
            SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
            FROM bid x JOIN bid y ON x.sh = y.sh AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        )
        SELECT a, b,
               ROUND(c / (sa.n + sb.n - c), 6) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE c / (sa.n + sb.n - c) >= {JACCARD_TAU}
        ORDER BY a, b
    """,
    "ann_topk": f"""
        WITH q AS (
            SELECT embedding AS qv FROM embeddings
            WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
        )
        SELECT vec_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(q.qv AS DOUBLE[])), 6) AS sim
        FROM embeddings, q
        WHERE vec_id != (SELECT MIN(vec_id) FROM embeddings)
        ORDER BY sim DESC, vec_id
        LIMIT {ANN_K}
    """,
    "embed_neardup": f"""
        SELECT x.vec_id AS a, y.vec_id AS b,
               ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                            CAST(y.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                           CAST(y.embedding AS DOUBLE[])), 6) >= {COSINE_TAU}
        ORDER BY a, b
    """,
}


# ---------------------------------------------------------------------------
# ANN scale paths: IVF (coarse quantizer) and hyperplane LSH
# ---------------------------------------------------------------------------

_IVF_LISTS = 16
_IVF_PROBES = 4
# Hyperplane LSH: T tables of B bits. The bench threshold (cosine 0.45,
# theta ~63 deg, per-bit agreement ~0.65) is a deliberately WEAK
# similarity, so recall needs many short tables (16 x 4: ~96% per-pair);
# at production near-dup thresholds (>=0.9) a couple of longer tables
# suffice and the candidate volume collapses.
_LSH_TABLES = 16
_LSH_BITS = 4


def _kmeans_lite(M: np.ndarray, k: int, iters: int = 5, seed: int = 13) -> np.ndarray:
    """Deterministic small k-means (numpy) for the IVF coarse quantizer.
    At 100 TB the centroids are trained on a sample and broadcast; here
    the sample is the (small) embeddings table itself."""
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(k, len(M)), replace=False)].copy()
    for _ in range(iters):
        sims = M @ C.T
        assign = sims.argmax(axis=1)
        for j in range(len(C)):
            members = M[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C


def q_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed ANN top-k — the scale path for q_ann_topk.

    Plan: train/broadcast centroids → assign vectors to inverted lists
    inside map_batches (batch x centroid matmul) → probe the query's
    top-P lists → exact cosine rerank of candidates only.  Rows-only
    driver check; recall vs brute force is pytest-asserted (>=0.8).
    """
    emb = _read_emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    C = _kmeans_lite(M, _IVF_LISTS)
    cref = ray.put(C)

    qid = int(ids[0])
    qv = M[0]
    probe_lists = np.argsort(-(C @ qv))[:_IVF_PROBES]
    probes = set(int(p) for p in probe_lists)

    def assign_and_filter(df: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cref)
        B = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        lists = (B @ cents.T).argmax(axis=1)
        keep = np.isin(lists, list(probes))
        out = df[keep].copy()
        out["sim"] = np.round(B[keep] @ qv, 6)
        return out[["vec_id", "sim"]]

    cand = (
        _read_emb(sf_dir)
        .map_batches(assign_and_filter, batch_format="pandas")
        .to_pandas()
    )
    cand = cand[cand["vec_id"] != qid]
    out = cand.sort_values(["sim", "vec_id"], ascending=[False, True]).head(ANN_K)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out.reset_index(drop=True)


def q_embed_neardup_lsh(sf_dir: str) -> pd.DataFrame:
    """Hyperplane-LSH near-duplicate pairs — the bucketed scale path for
    q_embed_neardup: sign-bit sketches route vectors into buckets (multi-
    probe over 1-bit flips), exact cosine verifies candidates, so
    precision is 1.0 and only recall is approximate (pytest >= 0.9)."""
    emb = _read_emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    rng = np.random.default_rng(29)
    pairs = set()
    for table in range(_LSH_TABLES):
        H = rng.normal(size=(_LSH_BITS, M.shape[1]))
        bits = (M @ H.T) > 0
        codes = (bits * (1 << np.arange(_LSH_BITS))).sum(axis=1)
        buckets: dict[int, list[int]] = {}
        for i, c in enumerate(codes):
            buckets.setdefault(int(c), []).append(i)
        for members in buckets.values():
            arr = np.array(members)
            iu, ju = np.triu_indices(len(arr), k=1)
            pairs.update(zip(arr[iu].tolist(), arr[ju].tolist()))
    if not pairs:
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "sim": pd.Series(dtype=np.float64)}
        )
    ii = np.array([p[0] for p in pairs])
    jj = np.array([p[1] for p in pairs])
    sims = np.round((M[ii] * M[jj]).sum(axis=1), 6)
    keep = sims >= COSINE_TAU
    out = pd.DataFrame({"a": ids[ii[keep]], "b": ids[jj[keep]], "sim": sims[keep]})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


QUERIES["ann_ivf"] = q_ann_ivf
QUERIES["embed_neardup_lsh"] = q_embed_neardup_lsh


def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Duplicate clusters: connected components over the exact Jaccard
    pair graph (>= tau), labeled by the minimum doc_id in the component.

    Distributed plan: iterative min-label propagation over the pair
    list (each round is a groupby-min — the standard scalable CC loop;
    rounds needed = graph diameter, tiny for near-dup clusters).  The
    oracle expresses the same closure with a recursive CTE.
    """
    pairs = q_jaccard_pairs(sf_dir)
    docs = _read_docs(sf_dir).to_pandas()["doc_id"]
    label = {int(d): int(d) for d in docs}
    edges = [(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])]
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            la, lb = label[a], label[b]
            m = min(la, lb)
            if la != m:
                label[a] = m
                changed = True
            if lb != m:
                label[b] = m
                changed = True
    out = pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster_id": list(label.values())}
    )
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["cluster_id"] = out["cluster_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["dedup_clusters"] = q_dedup_clusters
ORACLES["dedup_clusters"] = f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents
    ),
    bi AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS sh
        FROM toks a JOIN toks b USING (doc_id)
        WHERE b.ord = a.ord + 1
    ),
    bid AS (SELECT DISTINCT doc_id, sh FROM bi),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM bid GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
        FROM bid x JOIN bid y ON x.sh = y.sh AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    ),
    pairs AS (
        SELECT a, b FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE c / (sa.n + sb.n - c) >= {JACCARD_TAU}
    ),
    edges AS (
        SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
    ),
    reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
    )
    SELECT node AS doc_id, MIN(src) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
"""
