"""Composed corpus-curation pipeline: oracle parity, composition
consistency with the standalone operators, resumable partitioned
output."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"create view documents as select * from read_parquet('{SF}/documents.parquet')")
    return c


def test_curate_corpus_matches_oracle(ray_session, con):
    from pq_ray.pipelines.curation import ORACLES, QUERIES

    got = QUERIES["curate_corpus"](SF).reset_index(drop=True)
    exp = con.sql(ORACLES["curate_corpus"]).df().reset_index(drop=True)
    assert got.shape == exp.shape
    for c in got.columns:
        assert (got[c].astype(str).to_numpy() == exp[c].astype(str).to_numpy()).all(), c


def test_curation_composes_the_standalone_operators(ray_session):
    """The one-exchange composition picks exactly the docs that the
    three standalone (oracled) operators pick when chained."""
    from pq_ray.pipelines.curation import N_PER_SOURCE, QUERIES
    from pq_ray.pipelines.training import (
        _KNUTH,
        q_dedup_keep,
        q_repetition_filter,
    )

    import pyarrow.parquet as pq_

    curated = QUERIES["curate_corpus"](SF)
    keep = q_dedup_keep(SF).set_index("doc_id")["keep"]
    rep = q_repetition_filter(SF).set_index("doc_id")["keep"]
    docs = pq_.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    clean = docs[docs["doc_id"].map(keep) & docs["doc_id"].map(rep)].copy()
    clean["sample_key"] = (clean["doc_id"].to_numpy(dtype=np.int64) * _KNUTH) % (1 << 32)
    clean = clean.sort_values(["source", "sample_key", "doc_id"])
    expected = set(clean.groupby("source").head(N_PER_SOURCE)["doc_id"])
    assert set(curated["doc_id"]) == expected


def test_run_curation_resumable(ray_session, tmp_path):
    from pq_ray.pipelines.curation import run_curation

    out = str(tmp_path / "curated")
    r1 = run_curation(SF, out)
    assert r1 == {"resumed": False, "rows": 70} or (
        not r1["resumed"] and r1["rows"] > 0
    )
    import glob
    import hashlib

    files = sorted(glob.glob(f"{out}/source=*/part-0.parquet"))
    assert files  # partitioned by source
    digests = {f: hashlib.md5(open(f, "rb").read()).hexdigest() for f in files}
    r2 = run_curation(SF, out)
    assert r2["resumed"] and r2["rows"] == r1["rows"]
    for f, d in digests.items():  # byte-identical: nothing rewritten
        assert hashlib.md5(open(f, "rb").read()).hexdigest() == d
