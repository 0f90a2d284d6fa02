"""Training-data operator tests: oracle parity at sf0.001 plus
planted-duplicate recall checks for the approximate dedupers."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings"]:
        c.sql(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    return c


def _compare(got: pd.DataFrame, exp: pd.DataFrame):
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)[sorted(got.columns)]
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)[sorted(exp.columns)]
    assert len(gs) == len(es)
    assert list(gs.columns) == list(es.columns)
    for c in gs.columns:
        a, b = gs[c].to_numpy(), es[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b), c
        else:
            assert (a == b).all(), c


@pytest.mark.parametrize(
    "name", ["dedup_exact", "dedup_keep", "token_stats", "token_bpe",
             "jaccard_pairs", "ann_topk", "ann_topk_multi", "embed_neardup",
             "repetition_filter", "vocab_topk", "tfidf_topterm",
             "decontaminate"]
)
def test_oracle_parity(ray_session, con, name):
    from pq_ray.pipelines.training import ORACLES, QUERIES

    _compare(QUERIES[name](SF), con.sql(ORACLES[name]).df())


def test_minhash_recall_on_planted_dups(ray_session, tmp_path):
    """Plant near-duplicate pairs; MinHash-LSH must recover >=90% of the
    exact-Jaccard pairs (here it typically finds all of them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import _jaccard_pairs_from_ds, q_minhash_pairs

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(60):
        docs.append(" ".join(rng.choice(vocab, size=60)))
    # planted near-dups: copy with small mutations
    for i in range(20):
        toks = docs[i].split(" ")
        for _ in range(4):
            toks[rng.integers(len(toks))] = rng.choice(vocab)
        docs.append(" ".join(toks))
    table = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                      "text": pa.array(docs)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))

    exact = _jaccard_pairs_from_ds(rd.from_arrow(table), 0.3)
    approx = q_minhash_pairs(str(d))
    assert len(exact) >= 20  # every planted copy pairs with its source
    exact_pairs = set(zip(exact["a"], exact["b"]))
    approx_pairs = set(zip(approx["a"], approx["b"]))
    assert approx_pairs <= exact_pairs  # verification guarantees precision 1.0
    recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_simhash_close_for_near_dups(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_simhash

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(300)]
    base = " ".join(rng.choice(vocab, size=80))
    toks = base.split(" ")
    toks[3] = "changed"
    near = " ".join(toks)
    far = " ".join(rng.choice(vocab, size=80))
    table = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                      "text": pa.array([base, near, far])})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    out = q_simhash(str(d))
    h = [int(x, 16) for x in out.sort_values("doc_id")["simhash"]]
    ham_near = bin(h[0] ^ h[1]).count("1")
    ham_far = bin(h[0] ^ h[2]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 12


def test_lang_quality_deterministic(ray_session):
    from pq_ray.pipelines.training import q_lang_quality

    a = q_lang_quality(SF)
    b = q_lang_quality(SF)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"doc_id", "pred_lang", "quality"}
    assert a["quality"].between(0, 1).all()


def test_ann_ivf_recall(ray_session):
    from pq_ray.pipelines.training import QUERIES

    brute = QUERIES["ann_topk"](SF)
    ivf = QUERIES["ann_ivf"](SF)
    brute_set = set(brute["vec_id"])
    ivf_set = set(ivf["vec_id"])
    recall = len(brute_set & ivf_set) / len(brute_set)
    assert recall >= 0.8, recall
    # and the similarities it reports are exact (verified rerank)
    merged = ivf.merge(brute, on="vec_id", suffixes=("_ivf", "_bf"))
    assert (merged["sim_ivf"] == merged["sim_bf"]).all()


def test_embed_neardup_lsh_recall(ray_session):
    from pq_ray.pipelines.training import QUERIES

    exact = QUERIES["embed_neardup"](SF)
    lsh = QUERIES["embed_neardup_lsh"](SF)
    exact_pairs = set(zip(exact["a"], exact["b"]))
    lsh_pairs = set(zip(lsh["a"], lsh["b"]))
    assert lsh_pairs <= exact_pairs  # precision 1.0 (exact verification)
    if exact_pairs:
        recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.9, recall


def test_fingerprints_match_naive_reference(ray_session, tmp_path):
    """The batch-vectorized winnowing kernel equals a per-doc naive
    implementation (md5 k-gram hash + window argmin + md5 of the joined
    sorted fingerprints — the SQL-replicable scheme, VERDICT r4 #6),
    including edge cases: doc shorter than k, ng <= w, duplicate
    fingerprints inside one doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.model import stable_hash64
    from pq_ray.pipelines.training import q_fingerprints

    k, w = 5, 4
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]  # small vocab → repeated grams
    texts = ["a b c", "a b c d e", "a b c d e f g h",
             " ".join(rng.choice(vocab, size=3))]
    texts += [" ".join(rng.choice(vocab, size=int(n)))
              for n in rng.integers(1, 120, size=40)]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts),
                  "source": pa.array(["t"] * len(texts))}),
        d / "documents.parquet",
    )
    got = q_fingerprints(str(d), k=k, w=w)

    for i, text in enumerate(texts):
        toks = text.split(" ")
        ng = len(toks) - k + 1
        if ng <= 0:
            hs = np.array([], dtype=np.uint64)
        else:
            hs = np.array(
                [stable_hash64(" ".join(toks[j : j + k])) for j in range(ng)],
                dtype=np.uint64,
            )
        if len(hs) == 0:
            picks = np.array([], dtype=np.int64)
        elif len(hs) <= w:
            picks = np.array([int(np.argmin(hs))])
        else:
            win = np.lib.stride_tricks.sliding_window_view(hs, w)
            picks = np.unique(win.argmin(axis=1) + np.arange(len(win)))
        fps = np.sort(hs[picks])
        h = (
            stable_hash64(",".join(format(int(v), "016x") for v in fps))
            if len(fps) else 0
        )
        row = got[got["doc_id"] == i].iloc[0]
        assert row["n_fingerprints"] == len(fps), i
        assert row["fp_hash"] == format(h, "016x"), i


def test_embed_clusters_lsh_matches_exact_pair_source(ray_session):
    """The default (LSH) pair source yields the same cluster labels as
    the exact O(N^2) pair source at the recall bound — VERDICT r2 #1."""
    from pq_ray.pipelines.training import q_embed_clusters

    lsh = q_embed_clusters(SF, pair_source="lsh")
    exact = q_embed_clusters(SF, pair_source="exact")
    pd.testing.assert_frame_equal(lsh, exact)


def test_dedup_clusters_planted(ray_session, tmp_path):
    """Planted A~B~C duplicate chain collapses into one cluster labeled
    by the minimum doc_id (transitivity through connected components)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_dedup_clusters

    base = " ".join(f"w{i}" for i in range(50))
    near1 = base.replace("w3", "x3")
    near2 = near1.replace("w7", "x7")
    far = " ".join(f"z{i}" for i in range(50))
    table = pa.table({"doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
                      "text": pa.array([base, near1, near2, far])})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    out = q_dedup_clusters(str(d))
    lbl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lbl[10] == lbl[11] == lbl[12] == 10
    assert lbl[13] == 13


def test_connected_components_long_chain(ray_session):
    """>2-hop chain: propagation needs multiple rounds to reach the end."""
    from pq_ray.stages.graph import connected_components

    edges = pd.DataFrame(
        {"a": [1, 2, 3, 4, 5, 100], "b": [2, 3, 4, 5, 6, 101]}
    )
    out = connected_components(rd.from_pandas(edges), num_buckets=4)
    lbl = dict(zip(out["node"], out["label"]))
    assert all(lbl[n] == 1 for n in range(1, 7))
    assert lbl[100] == lbl[101] == 100


def test_connected_components_12_hop_chain(ray_session):
    """>8-hop component: the actor round loop must iterate well past the
    typical near-dup diameter and still converge to the chain minimum."""
    from pq_ray.stages.graph import connected_components

    n = 13  # path 0-1-...-12 → diameter 12
    edges = pd.DataFrame({"a": list(range(n - 1)), "b": list(range(1, n))})
    out = connected_components(rd.from_pandas(edges), num_buckets=4)
    lbl = dict(zip(out["node"], out["label"]))
    assert len(lbl) == n
    assert all(lbl[i] == 0 for i in range(n))


def test_connected_components_empty(ray_session):
    from pq_ray.stages.graph import connected_components

    out = connected_components(
        rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                     "b": pd.Series(dtype=np.int64)})),
        num_buckets=4,
    )
    assert len(out) == 0


def test_jaccard_max_df_caps_hot_shingles(ray_session):
    """A stopword bigram shared by every doc must not explode pair
    emission when max_df is set; with the cap off the oracle-exact pairs
    come back."""
    import pyarrow as pa

    from pq_ray.pipelines.training import _jaccard_pairs_from_ds

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)]
    # every doc starts with the same hot bigram "of the"
    docs = ["of the " + " ".join(rng.choice(vocab, size=40)) for _ in range(40)]
    docs.append(docs[0])  # one exact dup pair
    table = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                      "text": pa.array(docs)})
    ds = rd.from_arrow(table)
    uncapped = _jaccard_pairs_from_ds(ds, 0.3)
    capped = _jaccard_pairs_from_ds(ds, 0.3, max_df=10)
    # the planted dup survives the cap (it shares 40 rare bigrams)
    assert (0, 40) in set(zip(capped["a"], capped["b"]))
    assert set(zip(capped["a"], capped["b"])) <= set(zip(uncapped["a"], uncapped["b"]))


def test_minhash_verify_is_distributed(ray_session, tmp_path):
    """The exact-verify step must not materialize the docs table on the
    driver (no Dataset.to_pandas before the verify exchanges)."""
    import inspect

    from pq_ray.pipelines import training

    src = inspect.getsource(training.q_minhash_pairs)
    assert "to_pandas" not in src  # collect happens inside _verify_pairs_distributed
    src2 = inspect.getsource(training._verify_pairs_distributed)
    # only the final (tiny) pair table is collected
    assert src2.count("to_pandas") == 1


def test_simhash_pairs_exact_recall_vs_bruteforce(ray_session, tmp_path):
    """Pigeonhole guarantee: every pair within hamming<=3 of the 64-bit
    simhash appears (candidate recall is exact, verify is exact)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import (
        _popcount64,
        _simhash_batch,
        q_simhash_pairs,
    )

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(vocab, size=70)))
    for i in range(10):  # planted near-dups: tiny mutations
        toks = docs[i].split(" ")
        toks[rng.integers(len(toks))] = rng.choice(vocab)
        docs.append(" ".join(toks))
    table = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                      "text": pa.array(docs)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))

    got = q_simhash_pairs(str(d))
    got_pairs = set(zip(got["a"], got["b"]))
    # brute force over all pairs
    h = _simhash_batch(np.array(docs, dtype=object))
    exp = set()
    for i in range(len(docs)):
        x = _popcount64(h[i] ^ h[i + 1:])
        for off in np.nonzero(x <= 3)[0]:
            exp.add((i, i + 1 + int(off)))
    assert got_pairs == exp
    assert len(exp) >= 2  # planted dups landed close (md5 shingles)


def test_ann_ivf_multi_recall(ray_session):
    # the raw IVF retrieval, not the driver-facing check wrapper
    from pq_ray.pipelines.training import QUERIES, q_ann_ivf_multi

    brute = QUERIES["ann_topk_multi"](SF)
    ivf = q_ann_ivf_multi(SF)
    # the bench threshold (cosine 0.45) is deliberately WEAK similarity
    # (see the LSH parameter note in training.py): neighbor sets scatter
    # across many list boundaries, so per-query recall varies — assert
    # the mean plus a floor
    recalls = []
    for qid, g in brute.groupby("qid"):
        bset = set(g["vec_id"])
        iset = set(ivf[ivf["qid"] == qid]["vec_id"])
        recalls.append(len(bset & iset) / len(bset))
    assert np.mean(recalls) >= 0.7, recalls
    assert min(recalls) >= 0.5, recalls
    # reported sims are exact (verified rerank)
    merged = ivf.merge(brute, on=["qid", "vec_id"], suffixes=("_ivf", "_bf"))
    assert (merged["sim_ivf"] == merged["sim_bf"]).all()


def test_repetition_filter_edge_cases(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_repetition_filter

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "a",              # 1 token: no n-grams at all
                "a a a a",        # all repeats: dup mass 3/4, top bigram 3/3
                "x y z x y w q",  # top bigram "x y" ×2 of 6
            ],
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    out = q_repetition_filter(str(d)).set_index("doc_id")
    assert out.loc[0, ["n_tokens", "n_repeated_words", "top_bigram_n",
                       "top_trigram_n"]].tolist() == [1, 0, 0, 0]
    assert bool(out.loc[0, "keep"])  # vacuously clean
    assert out.loc[1, ["n_tokens", "n_repeated_words", "top_bigram_n",
                       "top_trigram_n"]].tolist() == [4, 3, 3, 2]
    assert not bool(out.loc[1, "keep"])  # 10*3 > 3*4
    assert out.loc[2, ["n_tokens", "top_bigram_n"]].tolist() == [7, 2]


def test_stratified_sample_matches_oracle_and_is_deterministic(ray_session, con):
    from pq_ray.pipelines.training import ORACLES, QUERIES

    got = QUERIES["stratified_sample"](SF)
    exp = con.sql(ORACLES["stratified_sample"]).df()
    _compare(got, exp)
    # stable under re-execution (resume / different block split must
    # pick the identical sample)
    again = QUERIES["stratified_sample"](SF)
    pd.testing.assert_frame_equal(got, again)
    assert (got.groupby("source").size() == 10).all()


def test_vocab_topk_wide_vocab(ray_session, tmp_path):
    """Planted corpus with a vocab far wider than K stresses the
    per-bucket top-K cut: a global top-K token is always in its own
    bucket's local top-K, so the merged candidate set is sufficient."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_vocab_topk

    rng = np.random.default_rng(7)
    vocab = np.array([f"tok{i:04d}" for i in range(500)])
    # zipf-ish frequencies so ranks are distinct and ties exist
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(20, 80), p=probs))
        for _ in range(400)
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)}),
        d / "documents.parquet",
    )
    got = q_vocab_topk(str(d), k=100)
    truth = (
        pd.Series(" ".join(texts).split(" ")).value_counts().rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    assert (got["token"].to_numpy() == truth["token"].to_numpy()).all()
    assert (got["n"].to_numpy() == truth["n"].to_numpy()).all()


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["a", "b", "c", "aa", "ab", "w1", "w2"])
_docs = st.lists(
    st.lists(_words, min_size=1, max_size=40).map(" ".join),
    min_size=1,
    max_size=12,
)


@given(_docs)
@settings(max_examples=150, deadline=None)
def test_repetition_signals_match_naive(texts):
    """The lexsort/reduceat kernel equals a per-doc Counter reference,
    including 1-token docs (no n-grams) and all-repeat docs."""
    from collections import Counter

    from pq_ray.pipelines.training import repetition_signals

    counts, n_rep, top_bi, top_tri, keep = repetition_signals(
        np.array(texts, dtype=object)
    )
    for i, text in enumerate(texts):
        toks = text.split(" ")
        n = len(toks)
        assert counts[i] == n
        assert n_rep[i] == n - len(set(toks))
        bi = Counter(zip(toks, toks[1:]))
        tri = Counter(zip(toks, toks[1:], toks[2:]))
        assert top_bi[i] == (max(bi.values()) if bi else 0)
        assert top_tri[i] == (max(tri.values()) if tri else 0)
        want_keep = (
            10 * (n - len(set(toks))) <= 3 * n
            and 5 * (max(bi.values()) if bi else 0) <= max(n - 1, 0)
            and 50 * (max(tri.values()) if tri else 0) <= 9 * max(n - 2, 0)
        )
        assert bool(keep[i]) == want_keep


def test_ann_ivf_multi_check_flag_and_exact_rows(ray_session):
    """The driver-facing IVF row = exact top-k per query + an all-true
    recall-contract flag (what makes it hashable against the
    brute-force oracle)."""
    from pq_ray.pipelines.training import QUERIES, q_ann_ivf_multi_check

    chk = q_ann_ivf_multi_check(SF)
    brute = QUERIES["ann_topk_multi"](SF)
    assert chk["ivf_ok"].all()
    pd.testing.assert_frame_equal(
        chk.drop(columns=["ivf_ok"]), brute, check_dtype=False
    )


def test_text_hash128_prime_field_correct_and_adversarial_safe():
    """ADVICE r4 #2: mod-2^64 polynomial hashing collides on Thue-Morse
    pairs for EVERY base; the prime-field (2^61-1) replacement must (a)
    equal the scalar modular reference and (b) separate that pair."""
    import pyarrow as pa

    from pq_ray.pipelines.training import (
        _B61_1,
        _mulmod_p61,
        _poly_hash_segments,
        _powmod_p61,
        _text_hash128,
        _PHI,
    )

    P = (1 << 61) - 1
    rng = np.random.default_rng(7)
    a = rng.integers(0, P, 2000, dtype=np.uint64)
    b = rng.integers(0, P, 2000, dtype=np.uint64)
    got = _mulmod_p61(a, b)
    exp = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)],
                   dtype=np.uint64)
    assert (got == exp).all()
    e = rng.integers(0, 100_000, 200, dtype=np.uint64)
    assert (
        _powmod_p61(_B61_1, e)
        == np.array([pow(int(_B61_1), int(x), P) for x in e], dtype=np.uint64)
    ).all()

    # Thue-Morse pair of length 2^11: a universal mod-2^64 collision
    n = 2048
    tm = np.array([bin(i).count("1") & 1 for i in range(n)], dtype=np.uint8)
    s1 = "".join("ab"[v] for v in tm)
    s2 = "".join("ba"[v] for v in tm)
    vals = np.frombuffer((s1 + s2).encode(), dtype=np.uint8)
    old = _poly_hash_segments(vals, np.array([n, n]), _PHI)
    assert old[0] == old[1]  # the attack the old scheme fell to
    h1, h2 = _text_hash128(pa.array([s1, s2]))
    assert h1[0] != h1[1] and h2[0] != h2[1]
    # determinism + equality on equal strings still holds
    g1, g2 = _text_hash128(pa.array([s1, s1]))
    assert g1[0] == g1[1] and g2[0] == g2[1]


def test_ann_ivf_check_oracle_contract(ray_session):
    """VERDICT r4 #7: the driver row for ann_ivf is the exact top-k plus
    a deterministic recall-contract flag; the flag must hold (True) so
    the TRUE-emitting oracle hashes green."""
    import duckdb

    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["ann_ivf"](sf)
    assert got["ivf_ok"].all()
    con = duckdb.connect()
    con.sql(
        f"create view embeddings as select * from "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    exp = con.sql(ORACLES["ann_ivf"]).df()
    g = got.sort_values(["vec_id"]).reset_index(drop=True)[sorted(got.columns)]
    x = exp.sort_values(["vec_id"]).reset_index(drop=True)[sorted(exp.columns)]
    assert g.astype(str).equals(x.astype(str))


@pytest.mark.parametrize("name", ["simhash", "simhash_pairs", "fingerprints"])
def test_simhash_fingerprints_oracle_parity(ray_session, name):
    """VERDICT r4 #6: the simhash/winnowing family hashes against DuckDB
    bit-for-bit now that shingle/k-gram/doc hashes are md5-based."""
    import duckdb

    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = QUERIES[name](sf)
    exp = con.sql(ORACLES[name]).df()
    g = got.sort_values(list(got.columns)).reset_index(drop=True)[
        sorted(got.columns)
    ]
    x = exp.sort_values(list(exp.columns)).reset_index(drop=True)[
        sorted(exp.columns)
    ]
    assert len(g) == len(x)
    assert g.astype(str).equals(x.astype(str)), name


def test_dedup_exact_tree_gather_parity(ray_session):
    """dedup_exact's (hash -> min doc, count) merge is associative; a
    forced deep tree gather reproduces the oracle exactly."""
    import duckdb

    import pq_ray.stages.exchange as ex
    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    old = ex.GATHER_FANIN
    try:
        ex.GATHER_FANIN = 2
        got = QUERIES["dedup_exact"](sf)
    finally:
        ex.GATHER_FANIN = old
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = con.sql(ORACLES["dedup_exact"]).df()
    g = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    x = exp.sort_values("doc_id").reset_index(drop=True)[sorted(exp.columns)]
    assert g.astype(str).equals(x.astype(str))


@pytest.mark.parametrize("name", ["span_dup_stats", "chunk_dedup"])
def test_span_chunk_oracle_parity(ray_session, name):
    """Round-5 ops: corpus-internal span-dedup stats and chunk-level
    exact dedup with reassembly hash against DuckDB bit-for-bit."""
    import duckdb

    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = QUERIES[name](sf)
    exp = con.sql(ORACLES[name]).df()
    g = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    x = exp.sort_values("doc_id").reset_index(drop=True)[sorted(exp.columns)]
    assert len(g) == len(x) > 0
    assert g.astype(str).equals(x.astype(str)), name


def test_span_dup_stats_planted(ray_session, tmp_path):
    """Engineered corpus: doc 2 copies doc 0's text verbatim (every gram
    duplicated, keep=False at ratio 1.0), doc 1 is unique (ratio 0.0),
    doc 3 is shorter than the gram width (0 grams, keep=True)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_span_dup_stats

    base = " ".join(f"w{i}" for i in range(20))
    uniq = " ".join(f"u{i}" for i in range(20))
    docs = [base, uniq, base, "a b c"]
    table = pa.table(
        {"doc_id": pa.array(range(4), type=pa.int64()), "text": pa.array(docs)}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    out = q_span_dup_stats(str(d)).set_index("doc_id")
    assert out.loc[0, "n_grams"] == 13 and out.loc[0, "n_dup"] == 13
    assert not out.loc[0, "keep"] and not out.loc[2, "keep"]
    assert out.loc[1, "n_dup"] == 0 and out.loc[1, "keep"]
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "keep"]
    assert out.loc[3, "dup_ratio"] == 0.0


def test_span_dup_stats_tree_gather_parity(ray_session):
    """The doc-keyed count-sum combine is associative: a forced fanin-2
    tree gather reproduces the oracle exactly."""
    import duckdb

    import pq_ray.stages.exchange as ex
    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    old = ex.GATHER_FANIN
    try:
        ex.GATHER_FANIN = 2
        got = QUERIES["span_dup_stats"](sf)
    finally:
        ex.GATHER_FANIN = old
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = con.sql(ORACLES["span_dup_stats"]).df()
    g = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    x = exp.sort_values("doc_id").reset_index(drop=True)[sorted(exp.columns)]
    assert g.astype(str).equals(x.astype(str))


def test_chunk_dedup_planted(ray_session, tmp_path):
    """Engineered corpus: doc 1 repeats doc 0's single chunk (loses it,
    text_clean empty); doc 2 shares its first 32-word chunk with doc 0
    but keeps its unique second chunk — reassembly preserves order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import CHUNK_WORDS, q_chunk_dedup

    chunk_a = " ".join(f"w{i}" for i in range(CHUNK_WORDS))
    chunk_b = " ".join(f"x{i}" for i in range(CHUNK_WORDS))
    docs = [chunk_a, chunk_a, chunk_a + " " + chunk_b]
    table = pa.table(
        {"doc_id": pa.array(range(3), type=pa.int64()), "text": pa.array(docs)}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    out = q_chunk_dedup(str(d)).set_index("doc_id")
    assert out.loc[0, "n_kept"] == 1 and out.loc[0, "text_clean"] == chunk_a
    assert out.loc[1, "n_kept"] == 0 and out.loc[1, "text_clean"] == ""
    assert out.loc[2, "n_chunks"] == 2 and out.loc[2, "n_kept"] == 1
    assert out.loc[2, "text_clean"] == chunk_b


def test_pack_sequences_oracle_parity(ray_session):
    """Round-5: sequence packing via the distributed range-partitioned
    prefix sum equals the single window-function scan (8 ranges at this
    scale, so cross-range base offsets are genuinely exercised)."""
    import duckdb

    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["pack_sequences"](sf)
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = con.sql(ORACLES["pack_sequences"]).df()
    g = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    x = exp.sort_values("doc_id").reset_index(drop=True)[sorted(exp.columns)]
    assert len(g) == len(x) > 0
    assert (g["n_seqs"] > 1).any()  # some docs straddle a sequence cut
    assert g.astype(str).equals(x.astype(str))


def test_pack_sequences_planted(ray_session, tmp_path):
    """Engineered corpus: 3 docs of 300/300/300 words at SEQ_LEN=512 —
    doc 0 sits in seq 0, doc 1 straddles seqs 0-1 (starts at 300),
    doc 2 straddles seqs 1-2 (starts at 600, ends at 899... seq 1);
    offsets are the exact running sum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_pack_sequences

    docs = [" ".join(f"w{i}" for i in range(300)) for _ in range(3)]
    table = pa.table(
        {"doc_id": pa.array(range(3), type=pa.int64()), "text": pa.array(docs)}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    out = q_pack_sequences(str(d)).set_index("doc_id")
    assert list(out["start_off"]) == [0, 300, 600]
    assert list(out["seq_first"]) == [0, 0, 1]
    assert list(out["seq_last"]) == [0, 1, 1]
    assert list(out["n_seqs"]) == [1, 2, 1]


@pytest.mark.parametrize(
    "name", ["chunk_dedup", "span_dup_stats", "pack_sequences"]
)
def test_training_sink_variants(ray_session, tmp_path, name):
    """The round-5 per-doc ops take sink_dir (their outputs are
    corpus-sized at 100x): the parquet sink equals the DataFrame path,
    only a summary reaches the driver, and a rerun resumes as a no-op."""
    import duckdb

    from pq_ray.pipelines.training import QUERIES
    from pq_ray.state import manifest as mf

    sf = "/root/testdata/sf0.001"
    sink = str(tmp_path / name)
    summary = QUERIES[name](sf, sink_dir=sink)
    assert isinstance(summary, dict) and not summary["skipped"]
    df = QUERIES[name](sf)
    assert summary["rows"] == len(df)
    c = duckdb.connect()
    got = (
        c.sql(f"select * from read_parquet('{sink}/*.parquet')")
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[df.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, df, check_dtype=False)
    assert mf.load(sink)["completed"]
    again = QUERIES[name](sf, sink_dir=sink)
    assert again["skipped"] and again["rows"] == len(df)


def test_source_report_oracle_parity(ray_session):
    """Round-5 composition: the per-source curation report (span-dup x
    repetition x token totals, all integer-exact) equals DuckDB, and a
    forced fanin-2 tree gather (associative per-doc combine) agrees."""
    import duckdb

    import pq_ray.stages.exchange as ex
    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = con.sql(ORACLES["source_report"]).df()
    for fanin in (None, 2):
        old = ex.GATHER_FANIN
        try:
            if fanin:
                ex.GATHER_FANIN = fanin
            got = QUERIES["source_report"](sf)
        finally:
            ex.GATHER_FANIN = old
        g = got.sort_values("source").reset_index(drop=True)[
            sorted(got.columns)
        ]
        x = exp.sort_values("source").reset_index(drop=True)[
            sorted(exp.columns)
        ]
        assert len(g) == len(x) > 0
        assert g.astype(str).equals(x.astype(str)), f"fanin={fanin}"
        assert (g["n_clean"] <= g["n_docs"]).all()


def test_pack_sequences_without_parquet_stats(ray_session, tmp_path):
    """Regression (round-5 review): a parquet written WITHOUT column
    statistics must fall back to one all-accepting range — every doc
    still present with exact offsets, not silently dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_pack_sequences

    docs = [" ".join(f"w{i}" for i in range(100)) for _ in range(5)]
    table = pa.table(
        {"doc_id": pa.array(range(5), type=pa.int64()), "text": pa.array(docs)}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        table, str(d / "documents.parquet"), write_statistics=False
    )
    out = q_pack_sequences(str(d)).set_index("doc_id")
    assert len(out) == 5
    assert list(out["start_off"]) == [0, 100, 200, 300, 400]


def test_pack_sequences_clustered_ids(ray_session, tmp_path):
    """Sparse/clustered doc_id spaces (e.g. prefix-partitioned ids) must
    not break the range scan: equi-depth row-group cuts spread the work
    and the offsets still equal the single ordered scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.training import q_pack_sequences

    ids = list(range(40)) + [10_000_000_000 + i for i in range(40)]
    docs = [" ".join(f"w{i}_{d}" for i in range(10)) for d in ids]
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(docs)}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"), row_group_size=10)
    out = q_pack_sequences(str(d)).sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 80
    assert list(out["start_off"]) == [i * 10 for i in range(80)]
    assert list(out["doc_id"]) == sorted(ids)


@pytest.mark.parametrize("name", ["shuffle_order", "mixture_sample"])
def test_shuffle_mixture_oracle_parity(ray_session, name):
    """Round-5 ordering/reweighting ops hash against DuckDB exactly."""
    import duckdb

    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = QUERIES[name](sf)
    exp = con.sql(ORACLES[name]).df()
    g = got.reset_index(drop=True)[sorted(got.columns)]
    x = exp.reset_index(drop=True)[sorted(exp.columns)]
    assert len(g) == len(x) > 0
    assert g.astype(str).equals(x.astype(str)), name


def test_shuffle_order_is_permutation(ray_session):
    """Every doc gets exactly one rank and ranks are exactly 1..N —
    the distributed rank loses and duplicates nothing."""
    from pq_ray.pipelines.training import q_shuffle_order

    out = q_shuffle_order("/root/testdata/sf0.001")
    n = len(out)
    assert sorted(out["shuffle_rank"]) == list(range(1, n + 1))
    assert out["doc_id"].is_unique


def test_oov_stats_oracle_parity(ray_session):
    """Round-5: per-doc OOV rate vs the exact top-K vocab equals DuckDB
    (shared deterministic top-K rule: count DESC, token ASC)."""
    import duckdb

    from pq_ray.pipelines.training import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = QUERIES["oov_stats"](sf)
    exp = con.sql(ORACLES["oov_stats"]).df()
    g = got.reset_index(drop=True)[sorted(got.columns)]
    x = exp.reset_index(drop=True)[sorted(exp.columns)]
    assert len(g) == len(x) > 0
    assert (g["n_oov"] > 0).any() and (g["n_oov"] <= g["n_tok"]).all()
    assert g.astype(str).equals(x.astype(str))
