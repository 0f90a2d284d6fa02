"""Decoder stage: pre-tokenized sequence rows → timestamped samples.

The Ray-Data analogue of the reference's decoder+mapper
(src/parse/decoding/decoder.rs, src/parse/mapping/strategy.rs): where pq
turns one log line into one Record and explodes its value fields into
Samples (src/query/sample.rs:80-103), we turn one corpus row
``(doc_id, tokens, n_tok, source)`` into ``n_tok`` samples of the
``token`` metric plus one sample of the ``n_tok`` metric (the analogue of
pq's synthetic ``__line__`` per-record stream).

Decode rule (fixed forever; FIXTURES.md):
    t_doc = EPOCH0 + (stable_hash64(doc_id) % T_SPAN_MS)  quantized to 1s
    sample k: ts = t_doc + k*STEP_MS,  value = float(tokens[k])
    labels  : {__name__: "token", source: source, shard: hash(doc_id)%8}

Deterministic per row → Ray task retries reproduce identical output
(lineage-exact).  Used as a callable CLASS with ``map_batches(DecodeTokens,
concurrency=N)`` so the per-series-id lookup tables are built once per
actor, not once per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..fixtures import N_SHARDS, SOURCES, STEP_MS, T_SPAN_MS
from ..model import EPOCH0_MS, signature, stable_hash64


def _series_id_lut() -> dict[str, np.ndarray]:
    """series_id per (source, shard) combo for each metric name.

    series_id = stable 64-bit hash of the canonical labelset signature —
    the same byte layout the reference keys its BTreeMap on
    (src/model/labels.rs:51-57) — truncated into uint64.  Used only for
    partitioning/grouping placement; semantic grouping always carries the
    label columns alongside.
    """
    luts = {}
    for name in ("token", "n_tok"):
        lut = np.empty(len(SOURCES) * N_SHARDS, dtype=np.uint64)
        for si, src in enumerate(SOURCES):
            for sh in range(N_SHARDS):
                sig = signature(
                    {"__name__": name, "source": src, "shard": str(sh)}
                )
                lut[si * N_SHARDS + sh] = np.uint64(
                    int.from_bytes(hashlib.md5(sig).digest()[:8], "big")
                )
        luts[name] = lut
    return luts


def _source_codes(source: pa.Array, code_map: dict[str, int]) -> np.ndarray:
    """source column → int codes via dictionary indices: one Python
    lookup per DISTINCT source (a handful), not per row."""
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()
    enc = source.dictionary_encode()
    lut = np.array([code_map[s] for s in enc.dictionary.to_pylist()], dtype=np.int64)
    return lut[enc.indices.to_numpy(zero_copy_only=False)]


def _doc_hashes(doc_ids: pa.Array) -> np.ndarray:
    """Vector of stable_hash64 per doc_id.

    One md5 per *row* (not per token) — ~3us/row, ~20% of the
    sort-free decode kernel.  The md5 rule is part of the fixed decode
    contract (FIXTURES.md), so it cannot be swapped for a faster hash.
    """
    return np.fromiter(
        (stable_hash64(s) for s in doc_ids.to_pylist()),
        dtype=np.uint64,
        count=len(doc_ids),
    )


class DecodeTokens:
    """Actor-pool batch transform: corpus batch → samples batch.

    Output schema (flat, Arrow-native, label columns not a map — the
    rollup hot path groups on typed columns):

        ts        int64    sample timestamp (Unix ms)
        value     float64  token id (or n_tok for the doc metric)
        name      string   metric name ("token" | "n_tok")
        source    string   label
        shard     int32    label (hash(doc_id) % 8)
        series_id uint64   placement hash of the full labelset
        [doc_id   string ]   only when provenance=True (tests)
        [pos      int32  ]   only when provenance=True (tests)
    """

    def __init__(self, emit_doc_metric: bool = True, provenance: bool = False):
        self._lut = _series_id_lut()
        self._src_code = {s: i for i, s in enumerate(SOURCES)}
        self.emit_doc_metric = emit_doc_metric
        self.provenance = provenance

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens").combine_chunks()
        if isinstance(tokens, pa.ChunkedArray):  # single-chunk after combine
            tokens = tokens.chunk(0)
        doc_ids = batch.column("doc_id").combine_chunks()
        source = batch.column("source").combine_chunks()
        n = len(batch)

        hashes = _doc_hashes(doc_ids)
        t_doc = EPOCH0_MS + ((hashes % T_SPAN_MS) // 1000) * 1000
        t_doc = t_doc.astype(np.int64)
        shard = (hashes % N_SHARDS).astype(np.int32)
        src_codes = _source_codes(source, self._src_code)
        combo = src_codes * N_SHARDS + shard

        counts = batch.column("n_tok").combine_chunks().to_numpy().astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        total = int(offsets[-1])

        flat_values = tokens.flatten().to_numpy(zero_copy_only=False)
        # position of each token within its row: arange - start_of_row
        pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
        ts = np.repeat(t_doc, counts) + pos * STEP_MS

        # row index per sample: string columns repeat via Arrow take
        # (stays Arrow-native — no to_pylist/object round-trip)
        row_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), counts))
        out = pa.table(
            {
                "ts": pa.array(ts, type=pa.int64()),
                "value": pa.array(flat_values.astype(np.float64), type=pa.float64()),
                "name": pa.array(["token"]).take(
                    pa.array(np.zeros(total, dtype=np.int64))
                ),
                "source": source.take(row_idx),
                "shard": pa.array(np.repeat(shard, counts), type=pa.int32()),
                "series_id": pa.array(
                    np.repeat(self._lut["token"][combo], counts), type=pa.uint64()
                ),
                **(
                    {
                        "doc_id": doc_ids.take(row_idx),
                        "pos": pa.array(pos.astype(np.int32), type=pa.int32()),
                    }
                    if self.provenance
                    else {}
                ),
            }
        )

        if self.emit_doc_metric:
            doc_tbl = pa.table(
                {
                    "ts": pa.array(t_doc, type=pa.int64()),
                    "value": pa.array(counts.astype(np.float64), type=pa.float64()),
                    "name": pa.array(np.full(n, "n_tok", dtype=object), type=pa.string()),
                    "source": source.cast(pa.string()),
                    "shard": pa.array(shard, type=pa.int32()),
                    "series_id": pa.array(self._lut["n_tok"][combo], type=pa.uint64()),
                    **(
                        {
                            "doc_id": doc_ids.cast(pa.string()),
                            "pos": pa.array(
                                np.full(n, -1, dtype=np.int32), type=pa.int32()
                            ),
                        }
                        if self.provenance
                        else {}
                    ),
                }
            )
            out = pa.concat_tables([out, doc_tbl])
        return out


def series_label_table():
    """Static series_id → label columns map for the token corpus (tiny:
    |sources| x |shards| x 2 metrics rows).  Lets the cascade shuffle
    carry only numeric columns and re-attach labels after the combine."""
    import pandas as pd

    lut = _series_id_lut()
    rows = []
    for name in ("token", "n_tok"):
        for si, src in enumerate(SOURCES):
            for sh in range(N_SHARDS):
                rows.append(
                    {
                        "series_id": lut[name][si * N_SHARDS + sh],
                        "name": name,
                        "source": src,
                        "shard": sh,
                    }
                )
    df = pd.DataFrame(rows)
    df["series_id"] = df["series_id"].astype(np.uint64)
    df["shard"] = df["shard"].astype(np.int32)
    return df


class DecodeToPartials:
    """Fused decode + window partial-aggregate actor stage.

    Emits per-(series, window) partial rows directly from the corpus
    batch — the per-sample table (ts/value/label strings) never
    materializes, which cuts the object-store traffic into the shuffle
    by ~10x and skips all Python-object column building.  Labels are
    re-attached post-combine from series_label_table().
    """

    def __init__(
        self, interval_ms: int, emit_doc_metric: bool = True, narrow: bool = False
    ):
        from .rollup import np_partial_agg, window_floor

        self._np_partial_agg = np_partial_agg
        self._window_floor = window_floor
        self.interval_ms = interval_ms
        self._lut = _series_id_lut()
        self._src_code = {s: i for i, s in enumerate(SOURCES)}
        self.emit_doc_metric = emit_doc_metric
        # narrow: emit the compact exchange schema (see narrow_schema_doc
        # below) — ~4x fewer bytes over the wire, derived from the corpus
        # dtype bounds (tokens < 2^17, <= 4 samples/s/doc, 1-day span).
        self.narrow = narrow and interval_ms == 1000

    def _fast_partial_agg(self, codes, sid, window, ts, val):
        """Partial agg via ONE argsort on a packed uint64 key — ~3x the
        4-key lexsort.  Key = series code | window index | in-window
        offset | integer value, ordering identical to (sid-grouping,
        window, ts, value)... except groups come out in code order
        rather than sid order, which is irrelevant to the shuffle.
        Falls back to the generic lexsort kernel when values don't fit
        the packing (non-integer or huge)."""
        widx = (window - EPOCH0_MS) // self.interval_ms
        off = (ts - window) // STEP_MS
        vi = val.astype(np.int64)
        if (
            widx.min() >= 0
            and widx.max() < (1 << 26)
            and off.max() < (1 << 12)
            and (vi == val).all()
            and vi.max() < (1 << 17)
            and vi.min() >= 0
        ):
            key = (
                (codes.astype(np.uint64) << np.uint64(55))
                | (widx.astype(np.uint64) << np.uint64(29))
                | (off.astype(np.uint64) << np.uint64(17))
                | vi.astype(np.uint64)
            )
            order = np.argsort(key, kind="stable")
            s_key = key[order] >> np.uint64(29)  # (code, window) group id
            boundary = np.nonzero(s_key[1:] != s_key[:-1])[0] + 1
            starts = np.concatenate(([0], boundary))
            n = len(val)
            counts_g = np.diff(np.concatenate((starts, [n])))
            s_v = val[order]
            s_ts = ts[order]
            return {
                "code": (s_key[starts] >> np.uint64(26)).astype(np.uint8),
                "series_id": sid[order][starts],
                "window_ts": window[order][starts],
                "sum": np.add.reduceat(s_v, starts),
                "count": counts_g.astype(np.int64),
                "min": np.minimum.reduceat(s_v, starts),
                "max": np.maximum.reduceat(s_v, starts),
                "first_ts": s_ts[starts],
                "first_v": s_v[starts],
                "last_ts": s_ts[starts + counts_g - 1],
                "last_v": s_v[starts + counts_g - 1],
            }
        return self._np_partial_agg(sid, window, ts, val)

    def _doc_aligned_partials(self, flat, counts, offsets, t_doc, combo):
        """Sort-free partial aggregation exploiting the corpus structure:
        t_doc is 1s-quantized and STEP_MS divides the interval, so every
        doc's samples tile its windows in exact runs of
        ``interval/STEP`` — per-(doc, window) partials are plain
        ``reduceat`` segments with NO per-sample ts/sid/window arrays and
        no sort.  The cross-doc combine then sorts only the ~4x-smaller
        per-doc-window partial stream on one packed uint64 key.

        Returns None when the corpus bounds don't hold (caller falls
        back to the generic per-sample kernel)."""
        spw = self.interval_ms // STEP_MS  # samples per window (4)
        n = len(counts)
        total = int(offsets[-1])
        if total and (flat.min() < 0 or flat.max() >= (1 << 17)):
            return None
        if self.emit_doc_metric and n and counts.max() >= (1 << 17):
            return None
        t_doc_w = (t_doc - EPOCH0_MS) // self.interval_ms  # window index/doc
        if len(t_doc_w) and (t_doc_w.min() < 0 or t_doc_w.max() >= (1 << 26) - (1 << 13)):
            return None

        # per-doc window segmentation: ceil(n_tok / spw) windows per doc
        nw = (counts + spw - 1) // spw
        total_w = int(nw.sum())
        within = np.arange(total_w, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(nw)[:-1])), nw
        )
        wstarts = np.repeat(offsets[:-1], nw) + within * spw
        w_cnt = np.minimum(np.repeat(counts, nw) - within * spw, spw)
        if total_w:
            w_sum = np.add.reduceat(flat, wstarts).astype(np.int64)
            w_min = np.minimum.reduceat(flat, wstarts)
            w_max = np.maximum.reduceat(flat, wstarts)
            w_first = flat[wstarts]
            w_last = flat[wstarts + w_cnt - 1]
        else:
            w_sum = w_min = w_max = w_first = w_last = np.array([], dtype=np.int64)
        widx = np.repeat(t_doc_w, nw) + within
        codes = np.repeat(combo, nw)
        l_off = w_cnt - 1

        if self.emit_doc_metric:
            codes = np.concatenate((codes, combo + len(SOURCES) * N_SHARDS))
            widx = np.concatenate((widx, t_doc_w))
            w_sum = np.concatenate((w_sum, counts))
            w_cnt = np.concatenate((w_cnt, np.ones(n, dtype=np.int64)))
            w_min = np.concatenate((w_min, counts))
            w_max = np.concatenate((w_max, counts))
            w_first = np.concatenate((w_first, counts))
            w_last = np.concatenate((w_last, counts))
            l_off = np.concatenate((l_off, np.zeros(n, dtype=np.int64)))

        # cross-doc combine on ONE packed key; window starts are sample-
        # aligned (first offset is always 0) so the first tie-break is
        # the value itself, and last = max (offset, value) via lkey
        key = (
            (codes.astype(np.uint64) << np.uint64(55))
            | (widx.astype(np.uint64) << np.uint64(29))
            | w_first.astype(np.uint64)
        )
        order = np.argsort(key)
        s_key = key[order]
        gkey = s_key >> np.uint64(29)
        boundary = np.nonzero(gkey[1:] != gkey[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        lkey = (l_off.astype(np.uint64) << np.uint64(17)) | w_last.astype(np.uint64)
        g = gkey[starts]
        g_code = (g >> np.uint64(26)).astype(np.uint8)
        g_widx = (g & np.uint64((1 << 26) - 1)).astype(np.int64)
        window = EPOCH0_MS + g_widx * self.interval_ms
        lk = np.maximum.reduceat(lkey[order], starts)
        first_v = (s_key[starts] & np.uint64((1 << 17) - 1)).astype(np.float64)
        return {
            "code": g_code,
            "series_id": self._code_lut()[g_code],
            "window_ts": window,
            "sum": np.add.reduceat(w_sum[order], starts).astype(np.float64),
            "count": np.add.reduceat(w_cnt[order], starts).astype(np.int64),
            "min": np.minimum.reduceat(w_min[order], starts).astype(np.float64),
            "max": np.maximum.reduceat(w_max[order], starts).astype(np.float64),
            "first_ts": window,  # first offset is always 0
            "first_v": first_v,
            "last_ts": window + ((lk >> np.uint64(17)).astype(np.int64)) * STEP_MS,
            "last_v": (lk & np.uint64((1 << 17) - 1)).astype(np.float64),
        }

    def _code_lut(self) -> np.ndarray:
        if not hasattr(self, "_code_lut_arr"):
            self._code_lut_arr = np.concatenate(
                (self._lut["token"], self._lut["n_tok"])
            )
        return self._code_lut_arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens").combine_chunks()
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.chunk(0)
        doc_ids = batch.column("doc_id").combine_chunks()
        source = batch.column("source").combine_chunks()
        n = len(batch)

        hashes = _doc_hashes(doc_ids)
        t_doc = (EPOCH0_MS + ((hashes % T_SPAN_MS) // 1000) * 1000).astype(np.int64)
        shard = (hashes % N_SHARDS).astype(np.int32)
        src_codes = _source_codes(source, self._src_code)
        combo = src_codes * N_SHARDS + shard

        counts = batch.column("n_tok").combine_chunks().to_numpy().astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        total = int(offsets[-1])

        out = None
        if self.interval_ms % STEP_MS == 0 and n > 0:
            flat_i = tokens.flatten().to_numpy(zero_copy_only=False)
            out = self._doc_aligned_partials(flat_i, counts, offsets, t_doc, combo)
        if out is None:
            flat_values = (
                tokens.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            )
            pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
            ts = np.repeat(t_doc, counts) + pos * STEP_MS
            sid = np.repeat(self._lut["token"][combo], counts)

            # token codes instead of 64-bit sids for the sort key
            codes = np.repeat(combo, counts)
            if self.emit_doc_metric:
                ts = np.concatenate((ts, t_doc))
                flat_values = np.concatenate((flat_values, counts.astype(np.float64)))
                sid = np.concatenate((sid, self._lut["n_tok"][combo]))
                codes = np.concatenate((codes, combo + len(SOURCES) * N_SHARDS))

            window = self._window_floor(ts, self.interval_ms)
            out = self._fast_partial_agg(codes, sid, window, ts, flat_values)
        if self.narrow:
            return self._narrow_table(out)
        return pa.table(
            {
                "series_id": pa.array(out["series_id"], type=pa.uint64()),
                "window_ts": pa.array(out["window_ts"], type=pa.int64()),
                "sum": pa.array(out["sum"], type=pa.float64()),
                "count": pa.array(out["count"], type=pa.int64()),
                "min": pa.array(out["min"], type=pa.float64()),
                "max": pa.array(out["max"], type=pa.float64()),
                "first_ts": pa.array(out["first_ts"], type=pa.int64()),
                "first_v": pa.array(out["first_v"], type=pa.float64()),
                "last_ts": pa.array(out["last_ts"], type=pa.int64()),
                "last_v": pa.array(out["last_v"], type=pa.float64()),
            }
        )

    def _narrow_table(self, out: dict) -> pa.Table:
        """Compact exchange schema — ~22 B/row vs ~80 B wide.

        Legal because the corpus bounds every field (input_hint: tokens
        int32 < 50257 → values < 2^17; n_tok <= 4096; STEP_MS=250 → <= 4
        samples/s/doc; one-day span → window index < 2^26; a decode
        batch <= 16384 docs bounds per-(series, window) count < 2^16 and
        sum < 2^32).  ``widen_narrow_partials`` inverts this inside the
        exchange reduce, so narrowness lives only on the wire.
        """
        window = out["window_ts"]
        widx = ((window - EPOCH0_MS) // self.interval_ms).astype(np.uint32)
        code = out.get("code")
        if code is None:  # wide-kernel fallback path
            code = self._code_of_sid(out["series_id"])
        count = out["count"]
        s = out["sum"]
        if count.max(initial=0) >= (1 << 16) or s.max(initial=0) >= (1 << 32):
            raise ValueError("narrow exchange bounds exceeded; use narrow=False")
        # values reaching the narrow path via the wide-kernel fallback
        # must be integer-valued and fit 17 bits — check every packed
        # value column, not just sum/count, or they'd silently wrap
        for c in ("min", "max", "first_v", "last_v"):
            v = out[c]
            if len(v) and (
                np.any(v != np.floor(v))
                or v.min() < 0
                or v.max() >= (1 << 17)
            ):
                raise ValueError("narrow exchange bounds exceeded; use narrow=False")
        f_off = ((out["first_ts"] - window) // STEP_MS).astype(np.uint32)
        l_off = ((out["last_ts"] - window) // STEP_MS).astype(np.uint32)
        fkey = (f_off << np.uint32(17)) | out["first_v"].astype(np.uint32)
        lkey = (l_off << np.uint32(17)) | out["last_v"].astype(np.uint32)
        return pa.table(
            {
                "code": pa.array(code, type=pa.uint8()),
                "widx": pa.array(widx, type=pa.uint32()),
                "sum": pa.array(s.astype(np.uint32), type=pa.uint32()),
                "count": pa.array(count.astype(np.uint16), type=pa.uint16()),
                "min": pa.array(out["min"].astype(np.uint32), type=pa.uint32()),
                "max": pa.array(out["max"].astype(np.uint32), type=pa.uint32()),
                "fkey": pa.array(fkey, type=pa.uint32()),
                "lkey": pa.array(lkey, type=pa.uint32()),
            }
        )

    def _code_of_sid(self, sids: np.ndarray) -> np.ndarray:
        if not hasattr(self, "_sid_to_code"):
            lut = self._lut
            m = {}
            for base, name in ((0, "token"), (len(lut["token"]), "n_tok")):
                for i, s in enumerate(lut[name]):
                    m[int(s)] = base + i
            self._sid_to_code = m
        m = self._sid_to_code
        return np.fromiter(
            (m[int(s)] for s in sids), dtype=np.uint8, count=len(sids)
        )


def series_code_lut() -> np.ndarray:
    """code (uint8) → series_id (uint64): token combos first, n_tok after
    (the inverse of the narrow exchange schema's code column)."""
    lut = _series_id_lut()
    return np.concatenate((lut["token"], lut["n_tok"]))


_TASK_DECODER: "DecodeToPartials | None" = None


def decode_partials_task(batch: pa.Table, *, interval_ms: int, narrow: bool = False) -> pa.Table:
    """Task-pool variant of DecodeToPartials with per-worker-process
    decoder caching.

    The decoder state (series-id LUTs) is built once per worker process
    and reused across batches — the same amortization an actor pool
    gives, without actor-pool scheduling: a fresh actor pool pays
    O(pool size) process startups per job, which measurably
    *anti-scales* small-to-medium jobs as CPUs grow (21s -> 4s on the
    31M-sample bench when this switched from a 16-actor pool to tasks).
    Use the DecodeToPartials class directly when the stage needs real
    per-actor state (models, large vocabs).
    """
    global _TASK_DECODER
    if (
        _TASK_DECODER is None
        or _TASK_DECODER.interval_ms != interval_ms
        or _TASK_DECODER.narrow != narrow
    ):
        _TASK_DECODER = DecodeToPartials(interval_ms, narrow=narrow)
    return _TASK_DECODER(batch)


def decode_dataset(ds, *, batch_size: int = 2048, concurrency=4, **kwargs):
    """tokens Dataset → samples Dataset.

    ``batch_size`` is deliberately small: each row fans out ~n_tok samples
    (64-4096x), so a 2048-row input batch is already a ~0.5-2M-row output
    block — sized to keep block bytes near the object-store sweet spot
    without splitting.
    """
    return ds.map_batches(
        DecodeTokens,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
