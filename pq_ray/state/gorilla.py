"""Gorilla chunk codec: delta-of-delta timestamps + XOR-compressed floats.

The compression scheme from the public Gorilla paper (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015),
applied to rolled-up points: each retention tier stores, per series, a
chunk struct::

    {series_id, t0, n, ts_dod: binary, <col>: binary per value column}

Timestamps (sorted window starts) encode as delta-of-delta with the
paper's variable-length buckets; values encode as XOR-with-previous
with leading/trailing-zero windows.  Rolled-up window starts are
perfectly regular (dod = 0 after the first point), so a tier's
timestamp stream compresses to ~1 bit/point.

Pure Python/numpy bit packing — runs inside per-series ``map_groups``
(the per-group state the reference keeps in its evaluator objects lives
here inside the group function, never across batches).  Round-trip
exactness (bit-for-bit on both ts and f64 values, incl. NaN/inf) is
property-tested in tests/test_gorilla.py.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode sorted int64 ms timestamps (n >= 1).

    Layout: first ts as 64 bits, first delta as zigzag varint-ish 64
    bits, then per-point dod buckets: '0' (dod=0), '10'+7b, '110'+9b,
    '1110'+12b, '1111'+64b (two's complement in-bucket offsets).
    """
    w = _BitWriter()
    n = len(ts)
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.bytes()
    delta = int(ts[1]) - int(ts[0])
    w.write(delta & ((1 << 64) - 1), 64)
    # fast path: perfectly regular stream (rolled-up tier windows are
    # regular by construction) → every dod is 0 → (n-2) zero BITS, which
    # is just zero bytes appended in bulk
    if n > 2:
        deltas = np.diff(ts.astype(np.int64))
        if (deltas == deltas[0]).all():
            total_bits = n - 2
            w.buf.extend(b"\x00" * (total_bits // 8))
            rem = total_bits % 8
            if rem:
                w.acc = 0
                w.nbits = rem
            return w.bytes()
    prev_delta = delta
    for i in range(2, n):
        d = int(ts[i]) - int(ts[i - 1])
        dod = d - prev_delta
        prev_delta = d
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.bytes()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    out = np.empty(n, dtype=np.int64)
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    out[0] = t0
    if n == 1:
        return out
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    prev_delta = delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        prev_delta += dod
        out[i] = out[i - 1] + prev_delta
    return out


def encode_values(vals: np.ndarray) -> bytes:
    """XOR-encode float64 values (bit-exact, incl. NaN payloads).

    '0' → same bits as previous; '1' '0' → meaningful bits fit the
    previous leading/length window; '1' '1' + 5b leading + 6b length +
    bits → new window.
    """
    bits = np.frombuffer(np.asarray(vals, dtype=np.float64).tobytes(), dtype=np.uint64)
    w = _BitWriter()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    lead, length = 0, 0  # current window (length==0 → none)
    for i in range(1, len(bits)):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        lz = 64 - xor.bit_length()
        tz = (xor & -xor).bit_length() - 1
        if lz > 31:
            lz = 31
        if length and lz >= lead and tz >= 64 - lead - length:
            w.write(0, 1)
            w.write(xor >> (64 - lead - length), length)
        else:
            lead = lz
            length = 64 - lz - tz
            w.write(1, 1)
            w.write(lead, 5)
            w.write(length & 0x3F, 6)  # 64 encodes as 0
            w.write(xor >> tz, length)
    return w.bytes()


def decode_values(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    prev = r.read(64)
    out[0] = prev
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            length = r.read(6) or 64
        meaningful = r.read(length)
        xor = meaningful << (64 - lead - length)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64).copy()


VALUE_COLS = ["sum", "count", "min", "max", "first_v", "last_v"]


def encode_chunk(group: "pd.DataFrame", value_cols=None) -> dict:
    """One points-table series group (sorted by window_ts) → chunk row."""
    value_cols = value_cols or VALUE_COLS
    ts = group["window_ts"].to_numpy(dtype=np.int64)
    row = {
        "t0": int(ts[0]),
        "n": len(ts),
        "ts_dod": encode_timestamps(ts),
    }
    for c in value_cols:
        row[f"g_{c}"] = encode_values(group[c].to_numpy(dtype=np.float64))
    return row


def decode_chunk(row: dict, value_cols=None) -> "pd.DataFrame":
    import pandas as pd

    value_cols = value_cols or VALUE_COLS
    n = int(row["n"])
    out = {"window_ts": decode_timestamps(row["ts_dod"], n)}
    for c in value_cols:
        out[c] = decode_values(row[f"g_{c}"], n)
    return pd.DataFrame(out)


def chunk_series(df: "pd.DataFrame", label_cols: list[str], value_cols=None):
    """points DataFrame (one shuffle bucket) → chunk rows, one per series.

    Used as the body of ``groupby(bucket).map_groups`` — per-series
    encoder state is local to the group, deterministic given the points.
    """
    import pandas as pd

    rows = []
    for sid, g in df.sort_values(["series_id", "window_ts"]).groupby(
        "series_id", sort=True
    ):
        row = {"series_id": sid}
        for c in label_cols:
            row[c] = g[c].iloc[0]
        row.update(encode_chunk(g, value_cols))
        rows.append(row)
    return pd.DataFrame(rows)


def read_chunks(chunks_path: str, label_cols=None, value_cols=None):
    """Gorilla chunks directory → decoded points Dataset.

    The read side of the chunk store: each chunk row decodes back to its
    (window_ts, aggregates) rows inside map_batches, so queries can run
    off the compressed tier without the points files.  Bit-exact inverse
    of chunk_series (tested against the written points)."""
    import pandas as pd
    import ray.data as rd

    label_cols = label_cols or ["name", "source", "shard"]
    value_cols = value_cols or VALUE_COLS

    def decode_batch(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, row in df.iterrows():
            pts = decode_chunk(row.to_dict(), value_cols)
            pts["series_id"] = row["series_id"]
            for c in label_cols:
                if c in row:
                    pts[c] = row[c]
            outs.append(pts)
        return pd.concat(outs, ignore_index=True)

    return rd.read_parquet(chunks_path).map_batches(
        decode_batch, batch_format="pandas"
    )
