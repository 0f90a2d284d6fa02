"""Batch (vectorized) evaluator for the pq PromQL subset.

Reproduces the reference's streaming evaluator tree
(src/query/evaluator.rs + vector.rs + aggregate.rs + binary.rs +
function.rs) as table transforms.  Every expression evaluates to a
*stream*: a scalar, or a vector stream = (ordered tick array, table of
non-empty per-tick samples).  Empty ticks (pq's gap-fill /
staleness-marker emissions, SURVEY.md Q3) are ticks present in the tick
array with no table rows.

Tick grid semantics (bit-matched to src/query/vector.rs — SURVEY.md
Q1-Q4):

- per selector, ``d = range duration`` (range selector) else the global
  lookback;
- ``t0`` = --since if given, else the first *matching* sample's ts;
- ``first_tick = t0 + min(d, interval) - 1``; ticks advance by interval;
- a sample at ``ts`` is visible at tick T iff ``T - d < ts <= T``
  (half-open windows);
- ticks continue while ``T - d < last_matching_ts`` (the buffer-drain
  rule: after EOF the reference keeps cutting ticks until the purge
  empties the buffer);
- instant vectors take the *latest* (ts, then arrival order) sample per
  series in the window; range vectors take all of them.

The quirks reproduced bit-for-bit: aggregation accumulator seeding
(count = v1 + (n-1), group = v1 for singletons — Q8), last_over_time =
chronologically oldest (Q7), comparison epsilon (Q6), __name__
keep/drop rules (Q5), BTreeMap output ordering via canonical byte
signatures (Q9), vector-join collision/many-to-one panics as typed
errors (Q10), binary tick-misalignment empty emissions.

Series ordering/grouping keys on the canonical byte signature
(model.signature) so output order is identical to the reference's
BTreeMap iteration.
"""

from __future__ import annotations

import sys
import warnings
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..model import signature
from .ast import (
    Aggregate,
    Binary,
    FunctionCall,
    NumberLiteral,
    Parentheses,
    Subquery,
    Unary,
    VectorSelector,
)

F64_EPSILON = sys.float_info.epsilon  # == Rust f64::EPSILON

DEFAULT_INTERVAL_MS = 1000


class QueryError(RuntimeError):
    pass


class VectorMatchingError(QueryError):
    """Typed replacement for the reference's panics on join collisions /
    implicit many-to-one matching (src/query/value.rs:86-92,114-117)."""


@dataclass
class ScalarStream:
    value: float
    kind: str = "scalar"


@dataclass
class VectorStream:
    kind: str  # "instant" | "range"
    ticks: np.ndarray  # int64, ordered, may be empty
    df: pd.DataFrame  # tick, value, name, <label cols>, sig, ord (+ ts, seq for range)
    label_cols: list[str] = field(default_factory=list)


@dataclass
class EvalContext:
    samples: pd.DataFrame  # ts, seq, name, value, <label cols>
    label_cols: list[str]
    interval: int
    lookback: int
    start_at: int | None = None
    # extensions=True enables the operators the reference PARSES but
    # never implements (and/or/unless, group_left/group_right, quantile/
    # stddev/stdvar/count_values) with PromQL semantics; the default
    # keeps exact parity (typed errors, tests/test_quirks.py)
    extensions: bool = False


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def L(c: str) -> str:
    """Label column name: user labels live in ``l_``-prefixed columns so
    a label literally called "name"/"value"/"tick" can't collide with
    the engine's internal columns."""
    return f"l_{c}"


def compute_sig(df: pd.DataFrame, label_cols: list[str], name_col: bool = True) -> np.ndarray:
    """Canonical byte signature per row (vectorized over unique label
    combos).  None/NaN label values = label absent.  __name__ included
    iff the name column holds a value."""
    cols = (["name"] if name_col and "name" in df.columns else []) + [
        L(c) for c in label_cols if L(c) in df.columns
    ]
    if not cols or df.empty:
        return np.array([b""] * len(df), dtype=object)
    sub = df[cols]
    uniq = sub.drop_duplicates()
    sigs = {}
    for row in uniq.itertuples(index=False):
        d = {}
        for c, v in zip(cols, row):
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            d["__name__" if c == "name" else c[2:]] = v
        key = tuple(row)
        sigs[key] = signature(d)
    keys = list(map(tuple, sub.itertuples(index=False)))
    return np.array([sigs[k] for k in keys], dtype=object)


def labels_of_row(row, label_cols: list[str], include_name: bool = True) -> dict:
    d = {}
    name = row.get("name") if hasattr(row, "get") else row["name"]
    if include_name and name is not None and not (isinstance(name, float) and np.isnan(name)):
        d["__name__"] = name
    for c in label_cols:
        v = row[L(c)]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        d[c] = v
    return d


def _rank_within_tick(df: pd.DataFrame) -> pd.DataFrame:
    """Assign ord = position within tick after the current row order."""
    df = df.reset_index(drop=True)
    df["ord"] = df.groupby("tick", sort=False).cumcount()
    return df


def _empty_vector(kind: str, label_cols: list[str]) -> VectorStream:
    cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
    if kind == "range":
        cols += ["ts", "seq"]
    else:
        cols += ["ts"]  # instant selectors carry ts (timestamp() ext)
    return VectorStream(
        kind, np.array([], dtype=np.int64), pd.DataFrame(columns=cols), label_cols
    )


# --------------------------------------------------------------------------
# selector evaluation
# --------------------------------------------------------------------------


def eval_selector(sel: VectorSelector, ctx: EvalContext) -> VectorStream:
    s = ctx.samples
    label_cols = ctx.label_cols
    kind = "range" if sel.range_ms is not None else "instant"
    d = sel.range_ms if sel.range_ms is not None else ctx.lookback
    interval = ctx.interval

    # ---- matcher filter (vectorized per label column) ----
    mask = np.ones(len(s), dtype=bool)
    for m in sel.all_matchers():
        col = "name" if m.label == "__name__" else L(m.label)
        if col not in s.columns:
            # missing label never matches for =, =~ ; for negative ops a
            # missing label *matches nothing either* (reference: sample
            # without the label returns None -> all() fails)
            mask &= False
            continue
        vals = s[col]
        present = vals.notna().to_numpy()
        if m.op == "=":
            mm = (vals == m.value).to_numpy(dtype=bool)
        elif m.op == "!=":
            mm = (vals != m.value).to_numpy(dtype=bool)
        else:
            rx = m.compiled()
            mm = vals.map(
                lambda v: v is not None
                and not (isinstance(v, float) and np.isnan(v))
                and rx.search(str(v)) is not None
            ).to_numpy(dtype=bool)
            if m.op == "!~":
                mm = ~mm
        mask &= mm & present
    matched = s[mask]
    if matched.empty:
        return _empty_vector(kind, label_cols)
    if getattr(sel, "offset_ms", 0):
        # offset extension: shifting sample timestamps forward by the
        # offset makes tick T read the original (T-d-offset, T-offset]
        # window.  The tick grid stays data-anchored (first *shifted*
        # sample), consistent with pq's grid rule.
        matched = matched.assign(ts=matched["ts"] + sel.offset_ms)

    ts = matched["ts"].to_numpy()
    t0 = ctx.start_at if ctx.start_at is not None else int(ts.min())
    first = t0 + min(d, interval) - 1
    last_ts = int(ts.max())
    # ticks exist while T - d < last_ts  =>  T <= last_ts + d - 1
    k_max = (last_ts + d - 1 - first) // interval
    if k_max < 0:
        return _empty_vector(kind, label_cols)
    ticks = first + interval * np.arange(k_max + 1, dtype=np.int64)

    # ---- window explode: sample -> every tick whose (T-d, T] contains it
    k_lo = np.ceil((ts - first) / interval).astype(np.int64)
    k_lo = np.maximum(k_lo, 0)
    k_hi = (ts + d - 1 - first) // interval
    k_hi = np.minimum(k_hi, k_max)
    reps = np.maximum(k_hi - k_lo + 1, 0)
    keep = reps > 0
    matched = matched[keep]
    reps = reps[keep]
    k_lo = k_lo[keep]
    total = int(reps.sum())
    if total == 0:
        return VectorStream(
            kind,
            ticks,
            pd.DataFrame(
                columns=["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord", "ts", "seq"]
            ),
            label_cols,
        )
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps
    )
    tick_col = first + (np.repeat(k_lo, reps) + within) * interval

    ex = matched.loc[matched.index.repeat(reps)].reset_index(drop=True)
    ex["tick"] = tick_col
    if getattr(sel, "offset_ms", 0):
        # windowing used the shifted ts; emit the sample's REAL time so
        # timestamp() (and any ts consumer) sees the data, not the shift
        ex["ts"] = ex["ts"] - sel.offset_ms
    ex["sig"] = compute_sig(ex, label_cols, name_col=True)

    if kind == "instant":
        # latest sample per (tick, series) = latest-PUSHED in-range sample:
        # the reference scans the deque newest-pushed-first regardless of
        # ts (vector.rs:203-217), so order by seq (arrival) alone; tail(1)
        # is positional — unlike groupby.last() it never skips a NaN value
        ex = ex.sort_values("seq", kind="stable")
        ex = ex.groupby(["tick", "sig"], sort=False).tail(1)
        ex = ex.sort_values(["tick", "sig"], kind="stable")
        ex = _rank_within_tick(ex)
        # "ts" rides along so the timestamp() extension can read the
        # sample time; every combinator re-builds its column list, so it
        # drops past the first non-selector node (PromQL: timestamp()
        # applies to a selector).
        cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord", "ts"]
        return VectorStream("instant", ticks, ex[cols], label_cols)

    # range vector: keep all window samples; series ordered by sig,
    # samples within a series by arrival (ts, seq)
    ex = ex.sort_values(["tick", "sig", "ts", "seq"], kind="stable")
    # ord identifies the series rank within tick (for output ordering)
    sig_rank = ex.groupby("tick", sort=False)["sig"].transform(
        lambda x: pd.factorize(x)[0]
    )
    ex["ord"] = sig_rank
    cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord", "ts", "seq"]
    return VectorStream("range", ticks, ex[cols], label_cols)


# --------------------------------------------------------------------------
# combinators
# --------------------------------------------------------------------------


def eval_unary(op: str, inner) -> object:
    if isinstance(inner, ScalarStream):
        # reference's UnaryEvaluator handles only instant vectors
        # (src/query/unary.rs:25-31 hits unimplemented!) — except that
        # literals parse their own sign; mirror with an eager fold:
        return ScalarStream(-inner.value if op == "-" else inner.value)
    if inner.kind != "instant":
        raise QueryError("unary operator on range vectors is not supported")
    df = inner.df.copy()
    if op == "-":
        df["value"] = -df["value"].to_numpy()
    # keep_name=true (src/query/unary.rs:16)
    return VectorStream("instant", inner.ticks, df, inner.label_cols)


def _scalar_op(op: str, l, r):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "%":
            return np.fmod(l, r)  # Rust % on f64 = fmod (sign of dividend)
        if op == "^":
            return np.power(l, r)
        if op == "atan2":  # extension: PromQL's trig binary operator
            return np.arctan2(l, r)
        if op == "==":
            return (np.abs(l - r) < F64_EPSILON).astype(np.float64)
        if op == "!=":
            return (np.abs(l - r) > F64_EPSILON).astype(np.float64)
        if op == ">":
            return (l > r).astype(np.float64)
        if op == ">=":
            return (l >= r).astype(np.float64)
        if op == "<":
            return (l < r).astype(np.float64)
        if op == "<=":
            return (l <= r).astype(np.float64)
    raise QueryError(f"operator {op!r} is not implemented")


def _apply_scalar_vector(
    op: str, vec: VectorStream, scalar: float, vector_on_left: bool, bool_modifier: bool
) -> VectorStream:
    if vec.kind != "instant":
        raise QueryError(f"scalar {op} range-vector operation is not supported")
    is_cmp = op in ("==", "!=", ">", ">=", "<", "<=")
    df = vec.df.copy()
    v = df["value"].to_numpy(dtype=np.float64)
    l, r = (v, scalar) if vector_on_left else (scalar, v)
    res = np.asarray(_scalar_op(op, l, r), dtype=np.float64)
    if is_cmp and not bool_modifier:
        # filter semantics: keep original value & __name__ where true
        keep = np.abs(res - 1.0) < F64_EPSILON
        df = df[keep]
    else:
        df["value"] = res
        df["name"] = None  # drop __name__ (arithmetic or bool comparison)
    return VectorStream("instant", vec.ticks, df, vec.label_cols)


def _zip_ticks(L: np.ndarray, R: np.ndarray):
    """The reference's two-stream alignment (src/query/binary.rs:273-295):
    zip two tick sequences; misaligned ticks emit an empty vector at
    min(lt, rt) and advance only the lagging side; stop when either side
    is exhausted.  Returns (all emitted ticks, joint ticks)."""
    if len(L) == len(R) and np.array_equal(L, R):
        return L.copy(), L.copy()  # aligned fast path
    out, joint = [], []
    li = ri = 0
    while li < len(L) and ri < len(R):
        lt, rt = L[li], R[ri]
        if lt == rt:
            out.append(lt)
            joint.append(lt)
            li += 1
            ri += 1
        elif lt < rt:
            out.append(lt)
            li += 1
        else:
            out.append(rt)
            ri += 1
    return (
        np.array(out, dtype=np.int64),
        np.array(joint, dtype=np.int64),
    )


def _match_cols(label_cols: list[str], matching) -> list[str]:
    if matching is None:
        return sorted(label_cols)
    kind, names = matching
    if kind == "on":
        return sorted(c for c in label_cols if c in names)
    return sorted(c for c in label_cols if c not in names)


def _eval_logical(node: Binary, left, right) -> VectorStream:
    """and / or / unless with PromQL set semantics (EXTENSION — the
    reference only parses these, src/query/binary.rs hits
    unimplemented!): full-labelset match (minus __name__), on/ignoring
    honored, lhs rows keep their values and names."""
    if not isinstance(left, VectorStream) or not isinstance(right, VectorStream) \
            or left.kind != "instant" or right.kind != "instant":
        raise QueryError(f"{node.op} requires two instant vectors")
    ticks, joint = _zip_ticks(left.ticks, right.ticks)
    lcols = _match_cols(left.label_cols, node.matching)
    rcols = _match_cols(right.label_cols, node.matching)
    ldf = left.df[left.df["tick"].isin(joint)].copy()
    rdf = right.df[right.df["tick"].isin(joint)].copy()
    ldf["msig"] = compute_sig(ldf, lcols, name_col=False)
    rdf["msig"] = compute_sig(rdf, rcols, name_col=False)
    rkeys = rdf[["tick", "msig"]].drop_duplicates()
    if node.op == "and":
        out = ldf.merge(rkeys, on=["tick", "msig"], how="inner", sort=False)
        label_cols = left.label_cols
    elif node.op == "unless":
        out = ldf.merge(
            rkeys, on=["tick", "msig"], how="left", indicator=True, sort=False
        )
        out = out[out["_merge"] == "left_only"].drop(columns=["_merge"])
        label_cols = left.label_cols
    else:  # or
        lkeys = ldf[["tick", "msig"]].drop_duplicates()
        extra = rdf.merge(
            lkeys, on=["tick", "msig"], how="left", indicator=True, sort=False
        )
        extra = extra[extra["_merge"] == "left_only"].drop(columns=["_merge"])
        label_cols = sorted(set(left.label_cols) | set(right.label_cols))
        out = pd.concat([ldf, extra], ignore_index=True)
    for c in label_cols:
        if L(c) not in out.columns:
            out[L(c)] = None
    out = out.sort_values(["tick", "sig"], kind="stable")
    out = _rank_within_tick(out)
    cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
    return VectorStream("instant", ticks, out[cols], label_cols)


def _eval_grouped_binary(node: Binary, left, right) -> VectorStream:
    """group_left / group_right many-to-one matching (EXTENSION — the
    reference parses the modifier then panics).  PromQL semantics: the
    'many' side keeps its labels (plus any labels named in the modifier
    copied from the 'one' side); the one side must be unique per
    (tick, match-signature)."""
    if not isinstance(left, VectorStream) or not isinstance(right, VectorStream) \
            or left.kind != "instant" or right.kind != "instant":
        raise QueryError("group_left/group_right requires two instant vectors")
    kind, extra_labels = node.grouping
    many, one = (left, right) if kind == "left" else (right, left)
    ticks, joint = _zip_ticks(left.ticks, right.ticks)
    mcols = _match_cols(many.label_cols, node.matching)
    ocols = _match_cols(one.label_cols, node.matching)
    mdf = many.df[many.df["tick"].isin(joint)].copy()
    odf = one.df[one.df["tick"].isin(joint)].copy()
    mdf["msig"] = compute_sig(mdf, mcols, name_col=False)
    odf["msig"] = compute_sig(odf, ocols, name_col=False)
    if odf.duplicated(["tick", "msig"]).any():
        raise VectorMatchingError(
            "found series collision for matching labels on the one side"
        )
    extra_labels = list(extra_labels or ())
    ocols_take = ["tick", "msig", "value"] + [
        L(c) for c in extra_labels if L(c) in odf.columns
    ]
    merged = mdf.merge(
        odf[ocols_take].rename(
            columns={"value": "ovalue", **{L(c): f"x_{c}" for c in extra_labels}}
        ),
        on=["tick", "msig"],
        how="inner",
        sort=False,
    )
    mv = merged["value"].to_numpy(dtype=np.float64)
    ov = merged["ovalue"].to_numpy(dtype=np.float64)
    lv, rv = (mv, ov) if kind == "left" else (ov, mv)
    res = np.asarray(_scalar_op(node.op, lv, rv), dtype=np.float64)
    is_cmp = node.kind == "comparison"
    keep_name = is_cmp and not node.bool_modifier
    if is_cmp and not node.bool_modifier:
        keep = np.abs(res - 1.0) < F64_EPSILON
        merged = merged[keep]  # many-side sample survives unchanged
    else:
        merged["value"] = res
        merged["name"] = None
    label_cols = sorted(set(many.label_cols) | set(extra_labels))
    for c in extra_labels:
        if f"x_{c}" in merged.columns:
            merged[L(c)] = merged[f"x_{c}"]
        elif L(c) not in merged.columns:
            merged[L(c)] = None
    for c in label_cols:
        if L(c) not in merged.columns:
            merged[L(c)] = None
    merged["sig"] = compute_sig(merged, label_cols, name_col=keep_name)
    merged = merged.sort_values(["tick", "sig"], kind="stable")
    merged = _rank_within_tick(merged)
    cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
    return VectorStream("instant", ticks, merged[cols], label_cols)


def eval_binary(node: Binary, left, right, extensions: bool = False) -> object:
    op = node.op
    if node.kind == "logical":
        if extensions:
            return _eval_logical(node, left, right)
        raise QueryError(f"operator {op!r} is not implemented")
    if op == "atan2" and not extensions:
        raise QueryError(f"operator {op!r} is not implemented")
    if isinstance(left, ScalarStream) and isinstance(right, ScalarStream):
        if node.kind == "comparison" and not node.bool_modifier:
            raise QueryError(
                "comparison between two scalars requires the bool modifier"
            )
        return ScalarStream(float(_scalar_op(op, left.value, right.value)))
    if isinstance(left, ScalarStream):
        return _apply_scalar_vector(op, right, left.value, False, node.bool_modifier)
    if isinstance(right, ScalarStream):
        return _apply_scalar_vector(op, left, right.value, True, node.bool_modifier)

    # vector (x) vector one-to-one
    if node.grouping is not None:
        if extensions:
            return _eval_grouped_binary(node, left, right)
        raise QueryError("group_left/group_right matching is not implemented")
    if left.kind != "instant" or right.kind != "instant":
        raise QueryError("binary operations require instant vectors")

    ticks, joint = _zip_ticks(left.ticks, right.ticks)
    is_cmp = node.kind == "comparison"
    keep_name = is_cmp and not node.bool_modifier

    lcols = _match_cols(left.label_cols, node.matching)
    rcols = _match_cols(right.label_cols, node.matching)

    ldf = left.df[left.df["tick"].isin(joint)].copy()
    rdf = right.df[right.df["tick"].isin(joint)].copy()
    ldf["msig"] = compute_sig(ldf, lcols, name_col=False)
    rdf["msig"] = compute_sig(rdf, rcols, name_col=False)

    # RHS duplicate signature -> collision (reference panics)
    if rdf.duplicated(["tick", "msig"]).any():
        raise VectorMatchingError(
            "found series collision for matching labels on the right-hand side"
        )

    merged = ldf.merge(
        rdf[["tick", "msig", "value"]].rename(columns={"value": "rvalue"}),
        on=["tick", "msig"],
        how="inner",
        sort=False,
    )
    lv = merged["value"].to_numpy(dtype=np.float64)
    rv = merged["rvalue"].to_numpy(dtype=np.float64)
    res = np.asarray(_scalar_op(op, lv, rv), dtype=np.float64)
    if is_cmp and not node.bool_modifier:
        keep = np.abs(res - 1.0) < F64_EPSILON
        merged = merged[keep]
    else:
        merged["value"] = res
    # many-to-one detection happens after the comparison filter
    if merged.duplicated(["tick", "msig"]).any():
        raise VectorMatchingError(
            "many-to-one matching detected; use group_left/group_right"
        )

    # output labels = matched labels (from the left side); __name__ from
    # the left sample iff keep_name
    out_cols = list(lcols)
    out = merged[["tick", "value", "ord", *[L(c) for c in out_cols]]].copy()
    out["name"] = merged["name"].to_numpy() if keep_name else None
    out["sig"] = compute_sig(out, out_cols, name_col=keep_name)
    out = out.sort_values(["tick", "ord"], kind="stable")
    out = _rank_within_tick(out)
    return VectorStream(
        "instant",
        ticks,
        out[["tick", "value", "name", *[L(c) for c in out_cols], "sig", "ord"]],
        out_cols,
    )


def _eval_count_values(node: Aggregate, inner, gcols: list[str]) -> VectorStream:
    """count_values("<label>", v) — EXTENSION: count samples per distinct
    value, the value itself attached as a new label (PromQL float repr)."""
    label = str(node.argument)
    df = inner.df.copy()
    df["gsig"] = compute_sig(df, gcols, name_col=False)
    from ..model import rust_f64_str

    df[L(label)] = [rust_f64_str(v) for v in df["value"].to_numpy(dtype=np.float64)]
    out_cols = sorted(set(gcols) | {label})
    g = (
        df.groupby(["tick", "gsig", L(label)], sort=True)
        .agg(n=("value", "size"), **{L(c): (L(c), "first") for c in gcols})
        .reset_index()
    )
    out = g[["tick", *[L(c) for c in out_cols]]].copy()
    out["value"] = g["n"].astype(np.float64)
    out["name"] = None
    out["sig"] = compute_sig(out, out_cols, name_col=False)
    out = out.sort_values(["tick", "sig"], kind="stable")
    out = _rank_within_tick(out)
    return VectorStream(
        "instant",
        inner.ticks,
        out[["tick", "value", "name", *[L(c) for c in out_cols], "sig", "ord"]],
        out_cols,
    )


def _promql_quantile(phi: float, vals: np.ndarray) -> float:
    """PromQL's quantile: linear interpolation on the sorted values."""
    if np.isnan(phi):
        return float("nan")
    if phi < 0:
        return float("-inf")
    if phi > 1:
        return float("inf")
    s = np.sort(vals)
    n = len(s)
    if n == 0:
        return float("nan")
    rank = phi * (n - 1)
    lo = int(np.floor(rank))
    hi = min(lo + 1, n - 1)
    w = rank - lo
    return float(s[lo] * (1 - w) + s[hi] * w)


def eval_aggregate(node: Aggregate, inner, extensions: bool = False) -> VectorStream:
    if isinstance(inner, ScalarStream) or inner.kind != "instant":
        raise QueryError("aggregate operators require an instant vector")
    op = node.op
    if op in ("quantile", "stddev", "stdvar", "count_values") and not extensions:
        # parity: the reference parses these then hits unimplemented!
        raise QueryError(f"aggregation operator {op!r} is not implemented yet")

    label_cols = inner.label_cols
    if node.modifier is None:
        gcols: list[str] = []
    else:
        kind, names = node.modifier
        if kind == "by":
            gcols = sorted(c for c in label_cols if c in names)
        else:
            gcols = sorted(c for c in label_cols if c not in names)

    df = inner.df.copy()
    if df.empty:
        return VectorStream(
            "instant",
            inner.ticks,
            pd.DataFrame(columns=["tick", "value", "name", *[L(c) for c in gcols], "sig", "ord"]),
            gcols,
        )
    if op == "count_values":
        return _eval_count_values(node, inner, gcols)
    df["gsig"] = compute_sig(df, gcols, name_col=False)
    # fold order = input vector order (reference iterates v.samples())
    df = df.sort_values(["tick", "ord"], kind="stable")

    if op in ("topk", "bottomk"):
        k = int(node.argument)

        def _top(g: pd.DataFrame) -> pd.DataFrame:
            asc = op == "bottomk"
            g = g.sort_values(
                ["value", "sig"], ascending=[asc, True], kind="stable"
            ).head(k)
            # deterministic emission order (value, sig) — the reference's
            # heap iteration order is unspecified (SURVEY.md Q9)
            return g

        out = (
            df.groupby(["tick", "gsig"], sort=True, group_keys=False)
            .apply(_top)
            .reset_index(drop=True)
        )
        out = _rank_within_tick(out)
        cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
        return VectorStream("instant", inner.ticks, out[cols], label_cols)

    # NaN-exact fold: the reference seeds the accumulator with the first
    # member's value and folds in input order (aggregate.rs:30-66) — sum
    # is plain f64 addition (NaN propagates), min/max use f64::min/max
    # (NaN-skipping), count seeds with the first VALUE.  pandas groupby
    # agg skips NaN, so reduce positionally on the (tick, gsig)-sorted
    # frame instead (stable sort keeps input order inside each group,
    # matching the reference's fold order bit-for-bit).
    df = df.sort_values(["tick", "gsig"], kind="stable")
    tick_a = df["tick"].to_numpy()
    gsig_a = df["gsig"].to_numpy()
    vals = df["value"].to_numpy(dtype=np.float64)
    boundary = np.nonzero((tick_a[1:] != tick_a[:-1]) | (gsig_a[1:] != gsig_a[:-1]))[0] + 1
    starts = np.concatenate(([0], boundary))
    counts = np.diff(np.concatenate((starts, [len(vals)])))
    agg = df.iloc[starts][["tick", "gsig", *[L(c) for c in gcols if L(c) in df.columns]]].reset_index(drop=True)
    for c in gcols:
        if L(c) not in agg.columns:
            agg[L(c)] = None
    n = counts
    first = vals[starts]
    if op == "sum":
        val = np.add.reduceat(vals, starts)
    elif op == "min":
        val = np.fmin.reduceat(vals, starts)
    elif op == "max":
        val = np.fmax.reduceat(vals, starts)
    elif op == "avg":
        val = np.add.reduceat(vals, starts) / n
    elif op == "count":
        # Q8 seed quirk: accumulator seeded with the first member's VALUE
        val = first + (n - 1)
    elif op == "group":
        val = np.where(n == 1, first, 1.0)
    elif op in ("stddev", "stdvar"):
        # population variance via E[x^2]-E[x]^2 (PromQL); NaN propagates
        s1 = np.add.reduceat(vals, starts)
        s2 = np.add.reduceat(vals * vals, starts)
        var = np.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        val = var if op == "stdvar" else np.sqrt(var)
    elif op == "quantile":
        phi = float(node.argument)
        val = np.array(
            [_promql_quantile(phi, vals[st : st + c]) for st, c in zip(starts, counts)]
        )
    else:  # pragma: no cover
        raise QueryError(f"aggregation operator {op!r} is not implemented")
    out = agg[["tick", *[L(c) for c in gcols]]].copy()
    out["value"] = val
    out["name"] = None
    out["sig"] = agg["gsig"].to_numpy()
    out = out.sort_values(["tick", "sig"], kind="stable")
    out = _rank_within_tick(out)
    return VectorStream(
        "instant",
        inner.ticks,
        out[["tick", "value", "name", *[L(c) for c in gcols], "sig", "ord"]],
        gcols,
    )


OVER_TIME_FNS = {
    "sum_over_time",
    "count_over_time",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "last_over_time",
    # extensions (the reference only parses `rate` as "coming soon",
    # README.md:194; semantics here are the simple per-window forms,
    # documented + tested locally — no reference goldens exist):
    "first_over_time",  # chronologically first sample (cf. Q7's last)
    "rate",             # (newest - oldest) / range_seconds
    "increase",         # newest - oldest
    "delta",            # newest - oldest (gauge delta)
}


EXTENSION_FNS = {
    "clamp",
    "clamp_max",
    "clamp_min",
    "label_replace",
    # instant-vector extensions (not even in the reference's enum —
    # parse only with parse_expr(extensions=True)); these operate on the
    # post-rollup driver stream, so the distributed evaluator gets them
    # for free through its EXTENSION_FNS branch
    "abs",
    "absent",
    "ceil",
    "floor",
    "round",
    "sqrt",
    "exp",
    "ln",
    "log2",
    "log10",
    "sgn",
    "sort",
    "sort_desc",
    "histogram_quantile",
    # trig + conversions (elementwise, drop __name__ like the math set)
    "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
    "deg", "rad",
    # time-component family (value = epoch seconds; vector arg REQUIRED)
    "minute", "hour", "day_of_week", "day_of_month", "day_of_year",
    "days_in_month", "month", "year",
    "timestamp",
    "label_join",
    "absent_over_time",
}

# range-vector extension kernels: evaluated on the window segments via
# the same reduceat machinery as the reference's *_over_time set.  The
# distributed evaluator pushes ALL of these down (distributed.py):
# stddev/stdvar/present ride the s2 partial, irate/idelta the newest-2
# partial, deriv/predict_linear the (sx, sxx, sxy) fit sums, and
# changes/resets/quantile_over_time/holt_winters the sample-stream
# exchange (full chronological sequence per (sid, tick) group) — and
# SUBQUERIES under any of these take the same sample plan over the
# inner step grid, so every kernel distributes for selector and
# subquery arguments alike.
EXT_OVER_TIME_FNS = {
    "stddev_over_time",
    "stdvar_over_time",
    "present_over_time",
    "quantile_over_time",
    "deriv",
    "predict_linear",
    "holt_winters",
    "changes",
    "resets",
    "irate",
    "idelta",
}

# PromQL elementwise math — all drop __name__ like clamp does
_MATH_FNS = {
    "abs": np.abs,
    "ceil": np.ceil,
    "floor": np.floor,
    "sqrt": np.sqrt,
    "exp": np.exp,
    "ln": np.log,
    "log2": np.log2,
    "log10": np.log10,
    "sgn": np.sign,
    # PromQL trigonometric family (all radians; deg/rad convert)
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "asin": np.arcsin,
    "acos": np.arccos,
    "atan": np.arctan,
    "sinh": np.sinh,
    "cosh": np.cosh,
    "tanh": np.tanh,
    "asinh": np.arcsinh,
    "acosh": np.arccosh,
    "atanh": np.arctanh,
    "deg": np.degrees,
    "rad": np.radians,
}

# PromQL time-component family: the sample VALUE is interpreted as a UTC
# epoch-seconds timestamp and the named component is returned.  PromQL's
# zero-arg default (vector(time())) needs an evaluation timestamp, which
# pq's data-anchored model doesn't have — the vector argument is
# REQUIRED here (documented divergence).
_TIME_FNS = {
    "minute": lambda dt: dt.minute,
    "hour": lambda dt: dt.hour,
    "day_of_week": lambda dt: (dt.dayofweek + 1) % 7,  # PromQL: 0 = Sunday
    "day_of_month": lambda dt: dt.day,
    "day_of_year": lambda dt: dt.dayofyear,
    "days_in_month": lambda dt: dt.days_in_month,
    "month": lambda dt: dt.month,
    "year": lambda dt: dt.year,
}


def _selector_of(node):
    """Unwrap Parentheses to find a direct VectorSelector argument."""
    from .ast import Parentheses, VectorSelector

    while isinstance(node, Parentheses):
        node = node.expr
    return node if isinstance(node, VectorSelector) else None


def _eval_absent(inner: "VectorStream", node) -> "VectorStream":
    """absent(v) extension: 1 at every tick of v's grid where v has no
    samples, labeled with the equality matchers of a direct selector
    argument (PromQL rule).  pq's tick grid is data-anchored (first
    matched sample), so a selector matching NOTHING has no grid and
    absent() over it is empty — documented divergence from PromQL's
    query-range-anchored grid."""
    label_map: dict[str, str] = {}
    sel = _selector_of(node.args[0]) if node is not None and node.args else None
    if sel is not None:
        for m in sel.matchers:
            if m.op == "=" and m.label != "__name__":
                label_map[m.label] = m.value
    ticks = inner.ticks
    present = set(inner.df["tick"].tolist()) if not inner.df.empty else set()
    missing = [int(t) for t in ticks if int(t) not in present]
    label_cols = sorted(label_map)
    cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
    if not missing:
        return VectorStream("instant", ticks, pd.DataFrame(columns=cols), label_cols)
    out = pd.DataFrame({"tick": missing})
    out["value"] = 1.0
    out["name"] = None
    for c in label_cols:
        out[L(c)] = label_map[c]
    out["sig"] = compute_sig(out, label_cols, name_col=False)
    out = out.sort_values(["tick", "sig"], kind="stable")
    out = _rank_within_tick(out)
    return VectorStream("instant", ticks, out[cols], label_cols)


def _bucket_quantile(phi: float, les: np.ndarray, counts: np.ndarray) -> float:
    """Prometheus bucketQuantile over cumulative le-buckets (linear
    interpolation inside the target bucket; +Inf bucket returns the
    highest finite upper bound; first bucket interpolates from 0 unless
    its upper bound is <= 0)."""
    if np.isnan(phi):
        return float("nan")
    if phi < 0:
        return float("-inf")
    if phi > 1:
        return float("inf")
    if len(les) < 2 or not np.isinf(les[-1]):
        return float("nan")
    counts = np.maximum.accumulate(counts)  # monotonicity fixup
    total = counts[-1]
    if total == 0:
        return float("nan")
    rank = phi * total
    b = int(np.searchsorted(counts, rank, side="left"))
    if b == len(les) - 1:
        return float(les[-2])
    if b == 0 and les[0] <= 0:
        return float(les[0])
    lo, lo_cnt = (0.0, 0.0) if b == 0 else (float(les[b - 1]), float(counts[b - 1]))
    hi, hi_cnt = float(les[b]), float(counts[b])
    if hi_cnt == lo_cnt:
        return hi
    return lo + (hi - lo) * (rank - lo_cnt) / (hi_cnt - lo_cnt)


def _eval_histogram_quantile(phi: float, inner: "VectorStream") -> "VectorStream":
    """histogram_quantile(phi, v) extension: v's series carry an ``le``
    label with cumulative bucket counts; output drops le and __name__."""
    le_col = L("le")
    out_label_cols = [c for c in inner.label_cols if c != "le"]
    cols = ["tick", "value", "name", *[L(c) for c in out_label_cols], "sig", "ord"]
    df = inner.df
    if df.empty or le_col not in df.columns:
        return VectorStream(
            "instant", inner.ticks, pd.DataFrame(columns=cols), out_label_cols
        )
    def _le_of(x) -> float:
        # Prometheus skips series whose le isn't a number
        try:
            return float(x) if x is not None else np.nan
        except (TypeError, ValueError):
            return np.nan

    df = df.copy()
    df["_le"] = np.array([_le_of(x) for x in df[le_col]], dtype=np.float64)
    df = df[~np.isnan(df["_le"])]
    if df.empty:  # every le was missing/unparsable
        return VectorStream(
            "instant", inner.ticks, pd.DataFrame(columns=cols), out_label_cols
        )
    # group by (tick, labels-without-le): sig recomputed without le/name
    df["_gsig"] = compute_sig(df, out_label_cols, name_col=False)
    df = df.sort_values(["tick", "_gsig", "_le"], kind="stable")
    tick_a = df["tick"].to_numpy()
    gsig_a = df["_gsig"].to_numpy()
    boundary = (
        np.nonzero((tick_a[1:] != tick_a[:-1]) | (gsig_a[1:] != gsig_a[:-1]))[0] + 1
    )
    starts = np.concatenate(([0], boundary))
    counts = np.diff(np.concatenate((starts, [len(df)])))
    les = df["_le"].to_numpy()
    vals = df["value"].to_numpy(dtype=np.float64)
    q = np.array(
        [
            _bucket_quantile(phi, les[st : st + c], vals[st : st + c])
            for st, c in zip(starts, counts)
        ]
    )
    out = df.iloc[starts][["tick", *[L(c) for c in out_label_cols if L(c) in df.columns]]].copy()
    for c in out_label_cols:
        if L(c) not in out.columns:
            out[L(c)] = None
    out["value"] = q
    out["name"] = None
    out["sig"] = gsig_a[starts]
    out = out.sort_values(["tick", "sig"], kind="stable")
    out = _rank_within_tick(out)
    return VectorStream("instant", inner.ticks, out[cols], out_label_cols)


def _eval_ext_function(name: str, args: list, node=None) -> VectorStream:
    """Instant-vector EXTENSIONS: clamp*/label_replace (the reference
    parses these then hits unimplemented!, function.rs) plus the PromQL
    math/sort/absent/histogram_quantile family (reference doesn't even
    parse those — gated at parse time)."""
    inner = args[1] if name == "histogram_quantile" else args[0]
    if name == "absent_over_time":
        # same grid-gap rule as absent(), but over the range windows:
        # 1 wherever the (T-d, T] window holds no samples
        if isinstance(inner, ScalarStream) or inner.kind != "range":
            raise QueryError("absent_over_time expects a range vector argument")
        return _eval_absent(inner, node)
    if isinstance(inner, ScalarStream) or inner.kind != "instant":
        raise QueryError(f"{name} expects an instant vector argument")
    df = inner.df.copy()

    def scalar(a) -> float:
        return a.value if isinstance(a, ScalarStream) else float(a)

    if name in _MATH_FNS or name == "round":
        v = df["value"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            if name == "round":
                # PromQL round: nearest multiple of to_nearest (default
                # 1), exact halves away from zero via floor(v/t + 0.5)
                to_nearest = scalar(args[1]) if len(args) > 1 else 1.0
                v = np.floor(v / to_nearest + 0.5) * to_nearest
            else:
                v = _MATH_FNS[name](v)
        df["value"] = v
        df["name"] = None  # PromQL: math functions drop __name__
        df["sig"] = compute_sig(df, inner.label_cols, name_col=False)
        df = df.sort_values(["tick", "sig"], kind="stable")
        df = _rank_within_tick(df)
        cols = ["tick", "value", "name", *[L(c) for c in inner.label_cols],
                "sig", "ord"]
        return VectorStream("instant", inner.ticks, df[cols], inner.label_cols)

    if name in _TIME_FNS or name == "timestamp":
        if name == "timestamp":
            if "ts" not in df.columns:
                raise QueryError(
                    "timestamp() needs the sample time, which only a "
                    "direct selector argument carries"
                )
            v = df["ts"].to_numpy(dtype=np.float64) / 1000.0
        else:
            vals = df["value"].to_numpy(dtype=np.float64)
            finite = np.isfinite(vals)
            v = np.full(len(vals), np.nan)
            if finite.any():
                dt = pd.DatetimeIndex(
                    pd.to_datetime(vals[finite], unit="s", utc=True)
                )
                v[finite] = np.asarray(_TIME_FNS[name](dt), dtype=np.float64)
        df["value"] = v
        df["name"] = None  # PromQL: these drop __name__
        df["sig"] = compute_sig(df, inner.label_cols, name_col=False)
        df = df.sort_values(["tick", "sig"], kind="stable")
        df = _rank_within_tick(df)
        cols = ["tick", "value", "name", *[L(c) for c in inner.label_cols],
                "sig", "ord"]
        return VectorStream("instant", inner.ticks, df[cols], inner.label_cols)

    if name == "label_join":
        # label_join(v, dst, sep, src1, src2, ...): dst := sep.join(src
        # label values, missing label = ""); an empty joined value
        # removes dst; __name__ is KEPT (labels-only transform)
        import re as _re

        dst, sep = str(args[1]), str(args[2])
        srcs = [str(a) for a in args[3:]]
        if not _re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
            raise QueryError(f"label_join: invalid destination label {dst!r}")

        def _sval(col: str) -> pd.Series:
            c = "name" if col == "__name__" else L(col)
            if c not in df.columns:
                return pd.Series([""] * len(df), index=df.index)
            return df[c].map(
                lambda x: ""
                if x is None or (isinstance(x, float) and np.isnan(x))
                else str(x)
            )

        joined = None
        for scol in srcs:
            part = _sval(scol)
            joined = part if joined is None else joined + sep + part
        if joined is None:
            joined = pd.Series([""] * len(df), index=df.index)
        dst_col = "name" if dst == "__name__" else L(dst)
        df[dst_col] = joined.map(lambda s: s if s != "" else None)
        label_cols = sorted(
            set(inner.label_cols) | ({dst} if dst != "__name__" else set())
        )
        for c in label_cols:
            if L(c) not in df.columns:
                df[L(c)] = None
        df["sig"] = compute_sig(df, label_cols, name_col=True)
        df = df.sort_values(["tick", "sig"], kind="stable")
        df = _rank_within_tick(df)
        cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
        return VectorStream("instant", inner.ticks, df[cols], label_cols)

    if name in ("sort", "sort_desc"):
        # presentation-order only: keep __name__ and sigs, reorder rows
        # within each tick by value (NaN last, numpy default)
        v = df["value"].to_numpy(dtype=np.float64)
        # argsort places NaN last in BOTH directions (NaN stays NaN
        # under negation and argsort treats it as largest)
        order = np.argsort(-v if name == "sort_desc" else v, kind="stable")
        df = df.iloc[order]
        df = df.sort_values("tick", kind="stable")  # group ticks, keep value order
        df = _rank_within_tick(df)
        cols = ["tick", "value", "name", *[L(c) for c in inner.label_cols],
                "sig", "ord"]
        return VectorStream("instant", inner.ticks, df[cols], inner.label_cols)

    if name == "absent":
        return _eval_absent(inner, node)

    if name == "histogram_quantile":
        return _eval_histogram_quantile(scalar(args[0]), inner)

    if name in ("clamp", "clamp_max", "clamp_min"):
        v = df["value"].to_numpy(dtype=np.float64)
        if name == "clamp":
            lo, hi = scalar(args[1]), scalar(args[2])
            v = np.clip(v, lo, hi)
        elif name == "clamp_max":
            v = np.minimum(v, scalar(args[1]))
        else:
            v = np.maximum(v, scalar(args[1]))
        df["value"] = v
        df["name"] = None  # PromQL: clamp* drop __name__
        df["sig"] = compute_sig(df, inner.label_cols, name_col=False)
        df = df.sort_values(["tick", "sig"], kind="stable")
        df = _rank_within_tick(df)
        cols = ["tick", "value", "name", *[L(c) for c in inner.label_cols],
                "sig", "ord"]
        return VectorStream("instant", inner.ticks, df[cols], inner.label_cols)

    # label_replace(v, dst, replacement, src, regex): anchored full-match
    # of src's value; on match dst := expansion ($1 group refs); empty
    # result removes the label; __name__ is KEPT (labels-only transform)
    import re as _re

    dst, repl, src, pattern = (str(a) for a in args[1:5])
    if not _re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
        raise QueryError(f"label_replace: invalid destination label {dst!r}")
    try:
        rx = _re.compile(pattern)
    except _re.error as e:
        raise QueryError(f"label_replace: invalid regex: {e}") from None
    # PromQL group refs are $1 / ${name}; Python expand wants \1 / \g<name>
    py_repl = _re.sub(r"\$(\d+)", r"\\\1", repl)
    py_repl = _re.sub(r"\$\{(\w+)\}", r"\\g<\1>", py_repl)
    src_col = "name" if src == "__name__" else L(src)
    dst_col = "name" if dst == "__name__" else L(dst)
    src_vals = df[src_col] if src_col in df.columns else pd.Series(
        [None] * len(df), index=df.index
    )
    out_vals = []
    dst_existing = df[dst_col] if dst_col in df.columns else pd.Series(
        [None] * len(df), index=df.index
    )
    for sv, dv in zip(src_vals, dst_existing):
        s = "" if sv is None or (isinstance(sv, float) and np.isnan(sv)) else str(sv)
        m = rx.fullmatch(s)
        if m is None:
            out_vals.append(dv)
        else:
            expanded = m.expand(py_repl)
            out_vals.append(expanded if expanded != "" else None)
    df[dst_col] = out_vals
    label_cols = sorted(set(inner.label_cols) | ({dst} if dst != "__name__" else set()))
    for c in label_cols:
        if L(c) not in df.columns:
            df[L(c)] = None
    df["sig"] = compute_sig(df, label_cols, name_col=True)
    df = df.sort_values(["tick", "sig"], kind="stable")
    df = _rank_within_tick(df)
    cols = ["tick", "value", "name", *[L(c) for c in label_cols], "sig", "ord"]
    return VectorStream("instant", inner.ticks, df[cols], label_cols)


def eval_function(
    node: FunctionCall,
    args: list,
    node_range_ms: int | None = None,
    extensions: bool = False,
) -> VectorStream:
    name = node.name
    if name in EXTENSION_FNS and extensions:
        return _eval_ext_function(name, args, node)
    ext_ot = extensions and name in EXT_OVER_TIME_FNS
    if name not in OVER_TIME_FNS and not ext_ot:
        raise QueryError(f"function {name!r} is not implemented (coming soon...)")
    if ext_ot:
        inner = next((a for a in args if isinstance(a, VectorStream)), None)
        nums = [
            a.value if isinstance(a, ScalarStream) else float(a)
            for a in args
            if not isinstance(a, VectorStream)
        ]
    else:
        (inner,) = args
        nums = []
    if inner is None or isinstance(inner, ScalarStream) or inner.kind != "range":
        raise QueryError(f"{name} expects a range vector argument")
    df = inner.df
    if df.empty:
        out = pd.DataFrame(
            columns=["tick", "value", "name", *[L(c) for c in inner.label_cols], "sig", "ord"]
        )
        return VectorStream("instant", inner.ticks, out, inner.label_cols)
    if ext_ot:
        # the PromQL extension kernels are time-ordered (deriv, irate,
        # holt_winters are defined over chronological points)
        df = df.sort_values(["tick", "sig", "ts", "seq"], kind="stable")
    else:
        # order by arrival (seq alone — the reference's deque is pure push
        # order, vector.rs:225-236) so 'oldest' = first-pushed exactly
        df = df.sort_values(["tick", "sig", "seq"], kind="stable")
    # positional/NaN-exact kernels: pandas groupby sum/first/last skip
    # NaN, the reference does not (f64 `.sum()` propagates NaN; min/max
    # fold from +-inf with NaN-skipping f64::min/max — function.rs:49-64)
    tick_a = df["tick"].to_numpy()
    sig_a = df["sig"].to_numpy()
    vals = df["value"].to_numpy(dtype=np.float64)
    ts_a = df["ts"].to_numpy() if "ts" in df.columns else tick_a
    keep = None  # EXT kernels may drop segments (e.g. <2 samples)
    boundary = np.nonzero((tick_a[1:] != tick_a[:-1]) | (sig_a[1:] != sig_a[:-1]))[0] + 1
    starts = np.concatenate(([0], boundary))
    counts = np.diff(np.concatenate((starts, [len(vals)])))
    ends = starts + counts - 1
    agg = df.iloc[starts][["tick", "sig", *[L(c) for c in inner.label_cols if L(c) in df.columns]]].reset_index(drop=True)
    for c in inner.label_cols:
        if L(c) not in agg.columns:
            agg[L(c)] = None
    n = counts.astype(np.float64)
    if name == "sum_over_time":
        val = np.add.reduceat(vals, starts)
    elif name == "count_over_time":
        val = n
    elif name == "avg_over_time":
        val = np.add.reduceat(vals, starts) / n
    elif name == "min_over_time":
        # fold(INFINITY, f64::min): skip NaN, all-NaN window -> +inf
        val = np.fmin.reduceat(vals, starts)
        val[np.isnan(val)] = np.inf
    elif name == "max_over_time":
        val = np.fmax.reduceat(vals, starts)
        val[np.isnan(val)] = -np.inf
    elif name in ("last_over_time", "first_over_time"):
        # Q7: the reference's last_over_time returns the chronologically
        # OLDEST sample (newest-first storage + .last()); our
        # first_over_time extension is the same value by construction
        val = vals[starts]
    elif name in ("stddev_over_time", "stdvar_over_time"):
        # population variance (PromQL), two-pass for accuracy
        mean = np.add.reduceat(vals, starts) / n
        dev = vals - np.repeat(mean, counts)
        var = np.add.reduceat(dev * dev, starts) / n
        val = var if name == "stdvar_over_time" else np.sqrt(var)
    elif name == "present_over_time":
        val = np.ones(len(starts), dtype=np.float64)
    elif name == "quantile_over_time":
        phi = nums[0]
        val = np.array(
            [_promql_quantile(phi, vals[st : st + c]) for st, c in zip(starts, counts)]
        )
    elif name in ("changes", "resets"):
        a, b = vals[:-1], vals[1:]
        if name == "changes":
            # NaN→NaN is not a change; NaN↔x is (PromQL)
            pair = (a != b) & ~(np.isnan(a) & np.isnan(b))
        else:
            with np.errstate(invalid="ignore"):
                pair = b < a  # counter reset
        flags = np.concatenate(([0.0], pair.astype(np.float64)))
        flags[starts] = 0.0  # pairs never span segment boundaries
        val = np.add.reduceat(flags, starts)
    elif name in ("irate", "idelta"):
        # last two chronological samples; <2 samples or 0 dt → no output
        keep = counts >= 2
        prev = np.maximum(ends - 1, 0)
        dv = vals[ends] - vals[prev]
        dt = (ts_a[ends] - ts_a[prev]) / 1000.0
        keep &= dt > 0
        if name == "irate":
            with np.errstate(invalid="ignore"):
                reset = vals[ends] < vals[prev]
            dv = np.where(reset, vals[ends], dv)  # counter reset → newest
            with np.errstate(divide="ignore", invalid="ignore"):
                val = dv / dt
        else:
            val = dv
    elif name in ("deriv", "predict_linear"):
        # least-squares fit y = a + b·x; deriv's slope is shift-invariant
        # so x anchors at the window's first sample; predict_linear
        # anchors at the tick (PromQL: x = ts - eval_ts, predict at t)
        keep = counts >= 2
        if name == "deriv":
            ref_t = ts_a[starts]
        else:
            ref_t = agg["tick"].to_numpy()
        x = (ts_a - np.repeat(ref_t, counts)) / 1000.0
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(vals, starts)
        sxx = np.add.reduceat(x * x, starts)
        sxy = np.add.reduceat(x * vals, starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            intercept = (sy - slope * sx) / n
            val = slope if name == "deriv" else intercept + slope * nums[0]
    elif name == "holt_winters":
        # double exponential smoothing, sequential by definition
        # (post-rollup driver stream — segment loop, numpy inner state)
        sf, tf = nums[0], nums[1]
        keep = counts >= 2
        val = np.full(len(starts), np.nan)
        for i, (st, c) in enumerate(zip(starts, counts)):
            if c < 2:
                continue
            seg = vals[st : st + c]
            s0, s1, b = 0.0, seg[0], seg[1] - seg[0]
            for j in range(1, c):
                xx = sf * seg[j]
                if j - 1 > 0:
                    b = tf * (s1 - s0) + (1.0 - tf) * b
                yy = (1.0 - sf) * (s1 + b)
                s0, s1 = s1, xx + yy
            val[i] = s1
    else:  # rate / increase / delta extensions
        diff = vals[ends] - vals[starts]
        if name == "rate":
            val = diff / (node_range_ms / 1000.0)
        else:
            val = diff
    if keep is not None and not bool(keep.all()):
        val = val[keep]
        agg = agg[keep]
    out = agg[["tick", *[L(c) for c in inner.label_cols]]].copy()
    out["value"] = val
    out["name"] = None  # all *_over_time drop __name__ (function.rs:49)
    out["sig"] = compute_sig(out, inner.label_cols, name_col=False)
    # emission order follows the input matrix order (by full sig) — the
    # groupby(sort=True) on the full sig already gives that order
    out = out.reset_index(drop=True)
    out = _rank_within_tick(out)
    return VectorStream(
        "instant",
        inner.ticks,
        out[["tick", "value", "name", *[L(c) for c in inner.label_cols], "sig", "ord"]],
        inner.label_cols,
    )


def eval_subquery(node: Subquery, ctx: EvalContext) -> VectorStream:
    """EXTENSION — ``<expr>[range:step]``: evaluate the inner expression
    on a step-spaced grid (same data-anchored grid rule as selectors,
    interval := step), then re-window the resulting points into
    range-vector segments on the OUTER query's grid — the exact
    window-explode the range selector uses (each inner point lands in
    every outer tick whose (T-range, T] window contains its tick)."""
    from dataclasses import replace

    inner = evaluate(node.expr, replace(ctx, interval=node.step_ms))
    if isinstance(inner, ScalarStream) or inner.kind != "instant":
        raise QueryError("subquery expects an instant-vector inner expression")
    label_cols = inner.label_cols
    cols = ["tick", "value", "name", *[L(c) for c in label_cols],
            "sig", "ord", "ts", "seq"]
    pts = inner.df
    if pts.empty:
        return VectorStream("range", inner.ticks, pd.DataFrame(columns=cols), label_cols)
    pts = pts.sort_values(["tick", "sig"], kind="stable").reset_index(drop=True)
    ts = pts["tick"].to_numpy()  # each inner point's time IS its tick
    interval, d = ctx.interval, node.range_ms
    t0 = ctx.start_at if ctx.start_at is not None else int(ts.min())
    first = t0 + min(d, interval) - 1
    last_ts = int(ts.max())
    k_max = (last_ts + d - 1 - first) // interval
    if k_max < 0:
        return VectorStream(
            "range", np.array([], dtype=np.int64),
            pd.DataFrame(columns=cols), label_cols,
        )
    ticks = first + interval * np.arange(k_max + 1, dtype=np.int64)
    k_lo = np.maximum(np.ceil((ts - first) / interval).astype(np.int64), 0)
    k_hi = np.minimum((ts + d - 1 - first) // interval, k_max)
    reps = np.maximum(k_hi - k_lo + 1, 0)
    keep = reps > 0
    total = int(reps[keep].sum())
    if total == 0:
        return VectorStream("range", ticks, pd.DataFrame(columns=cols), label_cols)
    seq = np.arange(len(pts), dtype=np.int64)  # arrival = inner grid order
    pts, ts, reps, k_lo, seq = pts[keep], ts[keep], reps[keep], k_lo[keep], seq[keep]
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps
    )
    ex = pts.loc[pts.index.repeat(reps)].reset_index(drop=True)
    ex["tick"] = first + (np.repeat(k_lo, reps) + within) * interval
    ex["ts"] = np.repeat(ts, reps)
    ex["seq"] = np.repeat(seq, reps)
    ex = ex.sort_values(["tick", "sig", "ts", "seq"], kind="stable")
    ex["ord"] = ex.groupby("tick", sort=False)["sig"].transform(
        lambda x: pd.factorize(x)[0]
    )
    return VectorStream("range", ticks, ex[cols], label_cols)


# --------------------------------------------------------------------------
# top-level evaluation
# --------------------------------------------------------------------------


def evaluate(node, ctx: EvalContext):
    if isinstance(node, NumberLiteral):
        return ScalarStream(node.value)
    if isinstance(node, Parentheses):
        return evaluate(node.expr, ctx)
    if isinstance(node, VectorSelector):
        return eval_selector(node, ctx)
    if isinstance(node, Subquery):
        if not ctx.extensions:
            raise QueryError("subqueries are an extension (extensions=True)")
        return eval_subquery(node, ctx)
    if isinstance(node, Unary):
        return eval_unary(node.op, evaluate(node.expr, ctx))
    if isinstance(node, Binary):
        return eval_binary(
            node, evaluate(node.lhs, ctx), evaluate(node.rhs, ctx), ctx.extensions
        )
    if isinstance(node, Aggregate):
        return eval_aggregate(node, evaluate(node.expr, ctx), ctx.extensions)
    if isinstance(node, FunctionCall):
        args = [
            a if isinstance(a, (float, str)) else evaluate(a, ctx) for a in node.args
        ]
        return eval_function(node, args, _fn_range_ms(node), ctx.extensions)
    raise QueryError(f"cannot evaluate node {node!r}")


def _fn_range_ms(node: FunctionCall) -> int | None:
    """The window duration a range-vector function divides/derives by:
    its DIRECT argument's range.  A Subquery argument contributes the
    subquery's OWN range — not the smaller range inside its inner
    expression (rate(f(m[1h])[2m:1m]) spans 2m of points, so rate
    divides by 2m)."""
    from .ast import Parentheses as _Par
    from .ast import Subquery as _Sub
    from .ast import VectorSelector as _Sel
    from .ast import find_smallest_range_ms

    for a in node.args:
        if isinstance(a, (float, str)):
            continue
        x = a
        while isinstance(x, _Par):
            x = x.expr
        if isinstance(x, (_Sel, _Sub)):
            return x.range_ms
        return find_smallest_range_ms(x)
    return None
