"""Gorilla codec round-trip property tests."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pq_ray.state.gorilla import (
    chunk_series,
    decode_chunk,
    decode_timestamps,
    decode_values,
    encode_chunk,
    encode_timestamps,
    encode_values,
)


@given(
    st.lists(
        st.integers(min_value=-(2**60), max_value=2**60), min_size=1, max_size=200
    )
)
@settings(max_examples=200, deadline=None)
def test_timestamp_roundtrip(deltas):
    ts = np.cumsum(np.array(deltas, dtype=np.int64))
    enc = encode_timestamps(ts)
    dec = decode_timestamps(enc, len(ts))
    assert np.array_equal(dec, ts)


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_value_roundtrip_bitexact(vals):
    arr = np.array(vals, dtype=np.float64)
    enc = encode_values(arr)
    dec = decode_values(enc, len(arr))
    # bit-exact comparison (NaN payloads included)
    assert np.array_equal(
        dec.view(np.uint64), arr.view(np.uint64)
    ), (arr, dec)


def test_regular_grid_compresses_well():
    # rolled-up window starts are perfectly regular → ~1 bit/point
    ts = np.arange(0, 86_400_000, 60_000, dtype=np.int64)
    enc = encode_timestamps(ts)
    assert len(enc) < len(ts) * 8 / 16  # way under 0.5 byte/point


def test_chunk_roundtrip():
    rng = np.random.default_rng(7)
    n = 500
    g = pd.DataFrame(
        {
            "window_ts": np.arange(n, dtype=np.int64) * 60_000 + 1_600_000_000_000,
            "sum": rng.normal(100, 5, n),
            "count": rng.integers(1, 50, n).astype(np.float64),
            "min": rng.normal(0, 1, n),
            "max": rng.normal(200, 1, n),
            "first_v": rng.normal(50, 1, n),
            "last_v": rng.normal(50, 1, n),
        }
    )
    row = encode_chunk(g)
    dec = decode_chunk(row)
    assert np.array_equal(dec["window_ts"].to_numpy(), g["window_ts"].to_numpy())
    for c in ["sum", "count", "min", "max", "first_v", "last_v"]:
        assert np.array_equal(
            dec[c].to_numpy().view(np.uint64), g[c].to_numpy().view(np.uint64)
        ), c


def test_chunk_series_groups():
    df = pd.DataFrame(
        {
            "series_id": [1, 1, 2, 2, 2],
            "window_ts": [0, 60_000, 0, 60_000, 120_000],
            "name": ["m"] * 5,
            "sum": [1.0, 2.0, 3.0, 4.0, 5.0],
            "count": [1.0] * 5,
            "min": [0.0] * 5,
            "max": [9.0] * 5,
            "first_v": [1.0] * 5,
            "last_v": [2.0] * 5,
        }
    )
    chunks = chunk_series(df, label_cols=["name"])
    assert len(chunks) == 2
    assert list(chunks["n"]) == [2, 3]
    dec = decode_chunk(chunks.iloc[1].to_dict())
    assert list(dec["sum"]) == [3.0, 4.0, 5.0]


def test_decode_fast_path_not_fooled_by_late_irregularity():
    # the zero-tail proof must reject a stream whose ONLY nonzero dod
    # is the final point (a '10'-bucket field at the very end)
    import numpy as np

    from pq_ray.state.gorilla import decode_timestamps, encode_timestamps

    ts = (np.arange(1000, dtype=np.int64) * 60000).copy()
    ts[-1] += 7  # one late irregular delta
    got = decode_timestamps(encode_timestamps(ts), len(ts))
    np.testing.assert_array_equal(got, ts)


def test_decode_constant_value_fast_path_and_late_change():
    import numpy as np

    from pq_ray.state.gorilla import decode_values, encode_values

    v = np.full(500, -7.25)
    np.testing.assert_array_equal(decode_values(encode_values(v), len(v)), v)
    v2 = v.copy()
    v2[-1] = 3.0  # last xor nonzero → must take the general path
    np.testing.assert_array_equal(decode_values(encode_values(v2), len(v2)), v2)
