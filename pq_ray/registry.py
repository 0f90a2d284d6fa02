"""By-name extension registry: decoders and formatters.

The Python counterpart of the reference's extension traits —
``DecodingStrategy`` (src/parse/decoding/strategy.rs:11-13) and
``Formatter`` (src/format/formatter.rs:11-13): a user plugs a new line
decoder or output formatter in by registering a factory under a name,
without touching core files (SURVEY.md §2.12).

    from pq_ray.registry import register_decoder

    @register_decoder("csv")
    class CsvDecoder:
        def __call__(self, raw: bytes) -> list[str]:
            return raw.decode("utf-8").rstrip("\\n").split(",")

Decoders: callable ``bytes -> list[str] | dict[str, str]`` (the
reference's ``DecodingResult::Tuple | Dict``); raise
``sources.lines.DecodeError`` for undecodable input (Q11: the runner
drops the line, or reports it on the verbose channel).

Formatters: callable ``(stream, verbose) -> list[str]`` used by the
runner for query-value output; entry/record formatting stays with the
built-ins unless the formatter also provides ``format_record`` /
``format_entry``.
"""

from __future__ import annotations

from collections.abc import Callable

_DECODERS: dict[str, Callable] = {}
_FORMATTERS: dict[str, Callable] = {}


def register_decoder(name: str, factory: Callable | None = None):
    """Register a decoder factory under ``name`` (usable as a decorator)."""
    if factory is None:
        def deco(f):
            _DECODERS[name] = f
            return f
        return deco
    _DECODERS[name] = factory
    return factory


def get_decoder(name: str) -> Callable:
    try:
        return _DECODERS[name]
    except KeyError:
        raise KeyError(
            f"no decoder registered under {name!r} (have: {sorted(_DECODERS)})"
        ) from None


def decoder_names() -> list[str]:
    return sorted(_DECODERS)


def register_formatter(name: str, factory: Callable | None = None):
    if factory is None:
        def deco(f):
            _FORMATTERS[name] = f
            return f
        return deco
    _FORMATTERS[name] = factory
    return factory


def get_formatter(name: str) -> Callable | None:
    return _FORMATTERS.get(name)


def formatter_names() -> list[str]:
    return sorted(_FORMATTERS)


def _register_builtins() -> None:
    from .sources.lines import JsonLineDecoder, RegexLineDecoder

    register_decoder("regex", RegexLineDecoder)
    register_decoder("json", JsonLineDecoder)

    # the reference's planned decoder plugins (src/program.rs:31-44),
    # implemented in sources/structured.py
    from .sources.structured import (
        CombinedLogDecoder,
        CsvDecoder,
        EnvoyLogDecoder,
        InfluxDbDecoder,
        LogfmtDecoder,
        PrometheusDecoder,
        RedisLogDecoder,
        ScanfDecoder,
    )

    register_decoder("csv", CsvDecoder)
    register_decoder("logfmt", LogfmtDecoder)
    register_decoder("scanf", ScanfDecoder)
    register_decoder("prometheus", PrometheusDecoder)
    register_decoder("influxdb", InfluxDbDecoder)
    register_decoder("nginx", CombinedLogDecoder)
    register_decoder("nginx:combined", CombinedLogDecoder)
    register_decoder("apache", CombinedLogDecoder)
    register_decoder("envoy", EnvoyLogDecoder)
    register_decoder("redis", RedisLogDecoder)

    from .format.human import format_stream_human
    from .format.promapi import format_stream
    from .format.promql import format_stream_promql

    register_formatter("to_promapi", lambda stream, verbose=False: format_stream(stream))
    register_formatter(
        "to_promql", lambda stream, verbose=False: format_stream_promql(stream)
    )
    register_formatter(
        "human",
        lambda stream, verbose=False, interactive=False: format_stream_human(
            stream, verbose=verbose, interactive=interactive
        ),
    )


_register_builtins()
