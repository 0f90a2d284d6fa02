"""§2.12 extension registry + human-formatter verbose/interactive parity
(reference: src/format/humanreadable.rs, src/runner.rs:139-156)."""

import numpy as np
import pandas as pd
import pytest

from pq_ray.format.human import InteractiveModeError, format_stream_human
from pq_ray.query.engine import EvalContext, evaluate
from pq_ray.query.parser import parse_expr
from pq_ray.runner import run_program


def _ctx(rows, label_cols=("l",), interval=1000, lookback=None):
    df = pd.DataFrame(rows, columns=["ts", "name", "value", *label_cols])
    df["seq"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = df["ts"].astype(np.int64)
    df["value"] = df["value"].astype(np.float64)
    for c in label_cols:
        df[f"l_{c}"] = df.pop(c)
    return EvalContext(
        samples=df,
        label_cols=list(label_cols),
        interval=interval,
        lookback=lookback or interval,
    )


# ---------------------------------------------------------------------------
# registry: plug a CSV decoder in WITHOUT touching core files
# ---------------------------------------------------------------------------


def test_register_csv_decoder_runs_through_registry():
    from pq_ray.registry import _DECODERS, get_decoder, register_decoder

    # register under a scratch name so the real built-in `csv` decoder
    # (pq_ray/sources/structured.py) is left untouched for later tests
    @register_decoder("csv_scratch")
    class CsvScratchDecoder:
        def __call__(self, raw: bytes) -> list:
            return raw.decode("utf-8").rstrip("\n").split(",")

    try:
        dec = get_decoder("csv_scratch")()
        assert dec(b"a,b,c\n") == ["a", "b", "c"]
        # built-ins are pre-registered
        assert get_decoder("json") is not None
        assert get_decoder("regex") is not None
        assert get_decoder("csv") is not None
        with pytest.raises(KeyError):
            get_decoder("nope")
    finally:
        _DECODERS.pop("csv_scratch", None)


def test_register_custom_formatter_used_by_runner():
    from pq_ray.registry import register_formatter

    def upper_fmt(stream, verbose=False):
        return [f"N={len(stream.df)}"]

    register_formatter("to_upper", upper_fmt)
    # parser won't produce 'to_upper', so drive the formatter lookup path
    # through a hand-built program AST
    from pq_ray.query.ast import Program, RegexDecoder
    from pq_ray.query.parser import parse_program

    p = parse_program("/(\\S+) (\\d+)/ | map {.0:ts, .1 as v} | select v | to_json")
    p2 = Program(decoder=p.decoder, mapper=p.mapper, query=p.query,
                 formatter="to_upper")
    out = run_program(p2, [b"1609459200 42"])
    assert out == ["N=1"]


# ---------------------------------------------------------------------------
# verbose: item-level error reporting + <no data>
# ---------------------------------------------------------------------------


def test_verbose_reports_decode_errors():
    sink: list = []
    out = run_program(
        "/(\\S+) (\\d+)/ | map {.0:ts, .1 as v} | select v | to_json",
        [b"1609459200 42", b"not matching at all", b"1609459201 43"],
        verbose=True,
        error_sink=sink,
    )
    assert len(sink) == 1  # the unmatched line was reported, not dropped
    assert out  # query still ran


def test_quiet_drops_errors_silently():
    sink: list = []
    run_program(
        "/(\\S+) (\\d+)/ | map {.0:ts, .1 as v} | select v | to_json",
        [b"garbage"],
        verbose=False,
        error_sink=sink,
    )
    assert sink == []


def test_verbose_no_data_emission():
    # gap tick: verbose prints '<ts> <no data>', quiet prints empty
    rows = [(5000, "m", 1.0, "a"), (8000, "m", 2.0, "a")]
    s = evaluate(parse_expr("m"), _ctx(rows))
    quiet = format_stream_human(s, verbose=False)
    loud = format_stream_human(s, verbose=True)
    assert "" in quiet
    gap_lines = [l for l in loud if l.endswith("<no data>")]
    assert gap_lines and all(l[4] == "-" for l in gap_lines)  # starts with a date


def test_verbose_entry_and_record_line_numbers():
    out = run_program(
        "/(\\w+)/",
        [b"alpha", b"beta"],
        verbose=True,
    )
    assert out == ["1: alpha", "2: beta"]


# ---------------------------------------------------------------------------
# interactive ANSI screen mode
# ---------------------------------------------------------------------------


def test_interactive_instant_vector_screen():
    rows = [(5000, "m", 1.5, "a")]
    s = evaluate(parse_expr("m"), _ctx(rows))
    out = format_stream_human(s, interactive=True)
    esc = chr(27)
    assert out[0].startswith(f"{esc}[2J{esc}[1;1H\n")
    body = out[0].split("\n")
    assert body[2] == "-"
    # metric line, literal newline line, then the label cells
    assert body[3] == "m"
    assert "__name__: 'm'" in out[0]
    assert "l: 'a'" in out[0]
    assert "\t\t\t1.5" in out[0]


def test_interactive_rejects_non_instant():
    rows = [(5000, "m", 1.0, "a")]
    s = evaluate(parse_expr("m[1s]"), _ctx(rows))
    with pytest.raises(InteractiveModeError):
        format_stream_human(s, interactive=True)
