"""Gap-fill: explicit staleness markers for empty windows.

pq's streaming evaluator emits an *empty vector* for every interval tick
that has no samples in lookback (SURVEY.md Q3 — the
``{"resultType":"vector","result":[]}`` lines in the goldens).  In the
batch tier tables that semantic becomes explicit marker rows:

- **global gaps**: windows on the tier's tick spine with no points at
  all — the exact analogue of pq's empty-vector emissions.  Cheap:
  distinct window list post-rollup is tiny, the setdiff runs on the
  driver.
- **per-series fill** (``fill_series``): dense per-series rows between a
  series' first and last window with count=0 / NaN aggregates — what a
  downstream consumer needs to distinguish "no data" from "no row"
  (staleness markers).  Runs inside the bucketed ``map_groups`` so it
  scales with the shuffle, never materializing the spine x series cross
  product on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

AGG_FLOAT_COLS = ["sum", "min", "max", "first_v", "last_v"]


def window_spine(min_w: int, max_w: int, interval_ms: int) -> np.ndarray:
    return np.arange(min_w, max_w + 1, interval_ms, dtype=np.int64)


def global_gap_windows(present_windows: np.ndarray, interval_ms: int) -> np.ndarray:
    """Missing windows on the global spine [min, max]."""
    if len(present_windows) == 0:
        return np.array([], dtype=np.int64)
    present = np.unique(present_windows)
    spine = window_spine(int(present[0]), int(present[-1]), interval_ms)
    return np.setdiff1d(spine, present, assume_unique=True)


def global_gaps_table(present_windows: np.ndarray, interval_ms: int) -> pd.DataFrame:
    gaps = global_gap_windows(present_windows, interval_ms)
    return pd.DataFrame(
        {
            "window_ts": gaps,
            "tier_ms": np.full(len(gaps), interval_ms, dtype=np.int64),
        }
    )


def fill_series(
    df: pd.DataFrame,
    interval_ms: int,
    label_cols: list[str],
) -> pd.DataFrame:
    """Densify each series between its first and last window.

    Inserted marker rows have count=0, NaN float aggregates, first_ts =
    last_ts = -1 and is_gap=True.  Intended as a map_groups body over
    shuffle buckets (bucket keyed by series so a series' windows are
    co-located; use bucket = hash(series_id) % P for this stage).
    """
    out = []
    for sid, g in df.groupby("series_id", sort=False):
        g = g.sort_values("window_ts")
        w = g["window_ts"].to_numpy()
        spine = window_spine(int(w[0]), int(w[-1]), interval_ms)
        missing = np.setdiff1d(spine, w, assume_unique=True)
        g = g.assign(is_gap=False)
        if len(missing):
            fill = pd.DataFrame({"window_ts": missing})
            fill["series_id"] = sid
            for c in label_cols:
                fill[c] = g[c].iloc[0]
            for c in AGG_FLOAT_COLS:
                fill[c] = np.nan
            fill["count"] = 0
            fill["first_ts"] = -1
            fill["last_ts"] = -1
            fill["is_gap"] = True
            g = pd.concat([g, fill], ignore_index=True).sort_values("window_ts")
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else df.assign(is_gap=False)
