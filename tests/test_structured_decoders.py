"""Structured decoders (sources/structured.py): the reference's
planned-but-absent decoder plugins (src/program.rs:31-44) implemented
against the registry decoder contract — unit behavior per decoder plus
program-level integration through the runner and the parser's
named-decoder grammar."""

import pytest

from pq_ray.query.ast import NamedDecoder
from pq_ray.query.parser import ParseError, parse_program
from pq_ray.runner import run_program
from pq_ray.sources.lines import DecodeError
from pq_ray.sources.structured import (
    CombinedLogDecoder,
    CsvDecoder,
    InfluxDbDecoder,
    LogfmtDecoder,
    PrometheusDecoder,
)


# ---------------------------------------------------------------------------
# CSV
# ---------------------------------------------------------------------------


def test_csv_tuple_and_header():
    d = CsvDecoder()
    assert d(b"a,b,c") == ["a", "b", "c"]
    dh = CsvDecoder(",", "x,y")
    assert dh(b"1,2") == {"x": "1", "y": "2"}


def test_csv_quoting_and_separator():
    d = CsvDecoder(";")
    assert d(b'a;"b;c";"say ""hi"""') == ["a", "b;c", 'say "hi"']
    assert d(b"a;;") == ["a", "", ""]


def test_csv_header_count_mismatch_is_decode_error():
    dh = CsvDecoder(",", "x,y,z")
    with pytest.raises(DecodeError):
        dh(b"only,two")


def test_csv_single_char_separator_enforced():
    with pytest.raises(ValueError):
        CsvDecoder("||")


# ---------------------------------------------------------------------------
# logfmt
# ---------------------------------------------------------------------------


def test_logfmt_pairs_quotes_flags():
    d = LogfmtDecoder()
    got = d(b'level=info msg="hello \\"world\\"" empty= flag dotted.key=1')
    assert got == {
        "level": "info",
        "msg": 'hello "world"',
        "empty": "",
        "flag": "",
        "dotted.key": "1",
    }


def test_logfmt_empty_line_is_error():
    with pytest.raises(DecodeError):
        LogfmtDecoder()(b"")


# ---------------------------------------------------------------------------
# Prometheus exposition
# ---------------------------------------------------------------------------


def test_prometheus_full_line():
    d = PrometheusDecoder()
    got = d(b'http_requests_total{method="post",code="200"} 1027 1395066363000')
    assert got == {
        "__name__": "http_requests_total",
        "method": "post",
        "code": "200",
        "value": "1027",
        "timestamp": "1395066363000",
    }


def test_prometheus_no_labels_no_ts_and_escapes():
    d = PrometheusDecoder()
    assert d(b"up 1") == {"__name__": "up", "value": "1"}
    got = d(rb'msg_count{text="a\"b\\c"} 2')
    assert got["text"] == 'a"b\\c'


def test_prometheus_comments_and_blank_drop():
    d = PrometheusDecoder()
    for line in (b"# HELP up Whether up", b"# TYPE up gauge", b"", b"   "):
        with pytest.raises(DecodeError):
            d(line)


# ---------------------------------------------------------------------------
# InfluxDB line protocol
# ---------------------------------------------------------------------------


def test_influxdb_tags_fields_timestamp():
    d = InfluxDbDecoder()
    got = d(b"cpu,host=server01,region=us usage_idle=90.5,count=12i 1609459200000000000")
    assert got == {
        "__measurement__": "cpu",
        "host": "server01",
        "region": "us",
        "usage_idle": "90.5",
        "count": "12",
        "timestamp": "1609459200000",
    }


def test_influxdb_escapes_strings_bools():
    d = InfluxDbDecoder()
    got = d(rb'my\ db,tag\,1=a\=b msg="say \"hi\", bye",ok=t')
    assert got["__measurement__"] == "my db"
    assert got["tag,1"] == "a=b"
    assert got["msg"] == 'say "hi", bye'
    assert got["ok"] == "true"
    assert "timestamp" not in got


def test_influxdb_malformed():
    d = InfluxDbDecoder()
    for line in (b"cpu_no_fields", b"", b"cpu bad", b"cpu v=1 notanumber"):
        with pytest.raises(DecodeError):
            d(line)


# ---------------------------------------------------------------------------
# nginx / apache combined
# ---------------------------------------------------------------------------

_COMBINED_LINE = (
    b'127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
    b'"GET /apache_pb.gif HTTP/1.0" 200 2326 "http://ref.example" "Mozilla/4.08"'
)


def test_combined_log_fields():
    got = CombinedLogDecoder()(_COMBINED_LINE)
    assert got["remote_addr"] == "127.0.0.1"
    assert got["remote_user"] == "frank"
    assert got["time_local"] == "10/Oct/2000:13:55:36 -0700"
    assert got["method"] == "GET"
    assert got["path"] == "/apache_pb.gif"
    assert got["status"] == "200"
    assert got["body_bytes_sent"] == "2326"
    assert got["http_referer"] == "http://ref.example"
    assert got["http_user_agent"] == "Mozilla/4.08"


def test_common_log_format_without_referer_ua():
    got = CombinedLogDecoder()(
        b'1.2.3.4 - - [10/Oct/2000:13:55:36 +0000] "POST /x HTTP/1.1" 404 -'
    )
    assert got["status"] == "404"
    assert got["body_bytes_sent"] == "-"
    assert "http_referer" not in got


def test_combined_log_non_matching_is_error():
    with pytest.raises(DecodeError):
        CombinedLogDecoder()(b"not an access log line")


# ---------------------------------------------------------------------------
# parser grammar + runner integration
# ---------------------------------------------------------------------------


def test_parser_named_decoder_with_args():
    ast = parse_program('csv(";", "a,b") | map {.a:ts, .b:num}')
    assert ast.decoder == NamedDecoder("csv", (";", "a,b"))
    assert parse_program("logfmt | map {.ts:ts}").decoder == NamedDecoder("logfmt")
    assert parse_program("nginx:combined").decoder == NamedDecoder("nginx:combined")


def test_parser_unknown_decoder_keeps_reference_error():
    with pytest.raises(ParseError, match="must start from a known parser"):
        parse_program("kafka | map {.0:ts}")


def test_parser_named_decoder_bad_args():
    with pytest.raises(ParseError, match="expected string literal"):
        parse_program("csv(42) | map {.0:ts}")


def test_runner_csv_program_end_to_end():
    lines = [b"1609459200,login,1.5", b"not-a-csv-row", b"1609459201,click,2.5"]
    out = run_program(
        'csv(",", "ts,ev,v") | map {.ts:ts, .ev as event, .v:num} | to_json', lines
    )
    # the malformed row drops silently (Q11)
    assert out == [
        '{"timestamp":1609459200000,"labels":{"event":"login"},"values":{"v":1.5}}',
        '{"timestamp":1609459201000,"labels":{"event":"click"},"values":{"v":2.5}}',
    ]


def test_runner_logfmt_select_program():
    lines = [f"ts={1609459200 + i} event=e{i % 2} v={i}".encode() for i in range(6)]
    out = run_program(
        "logfmt | map {.ts:ts, .event, .v:num} | select sum(v) by (event) | to_promapi",
        lines,
    )
    assert (
        out[0]
        == '{"resultType":"vector","result":[{"metric":{"event":"e0"},"value":[1609459200.999,"0"]}]}'
    )


def test_runner_prometheus_program():
    lines = [
        b"# HELP reqs total",
        b'reqs{code="200"} 3 1609459200000',
        b'reqs{code="500"} 1 1609459200000',
    ]
    out = run_program(
        "prometheus | map {.timestamp:ts, .code:str, .value:num as v} | to_json", lines
    )
    assert len(out) == 2 and '"code":"200"' in out[0]


def test_runner_nginx_program_timestamp_guess():
    out = run_program(
        "nginx | map {.time_local:ts, .status:num} | to_json", [_COMBINED_LINE]
    )
    # 2000-10-10 13:55:36 -0700 = 20:55:36 UTC
    assert out == ['{"timestamp":971211336000,"labels":{},"values":{"status":200.0}}']


# ---------------------------------------------------------------------------
# scanf
# ---------------------------------------------------------------------------


def test_scanf_conversions():
    from pq_ray.sources.structured import ScanfDecoder

    d = ScanfDecoder("%s %d %f")
    assert d(b"login 1609459200 1.5") == ["login", "1609459200", "1.5"]
    # %x hex, %c single char, %% literal percent, literal text
    d2 = ScanfDecoder("id=%x grade=%c load=%f%%")
    assert d2(b"id=0xff grade=A load=97.5%") == ["0xff", "A", "97.5"]


def test_scanf_whitespace_runs_and_mismatch():
    from pq_ray.sources.structured import ScanfDecoder

    d = ScanfDecoder("%s   %d")
    assert d(b"a \t  42") == ["a", "42"]
    with pytest.raises(DecodeError):
        d(b"a notanumber")


def test_scanf_bad_patterns():
    from pq_ray.sources.structured import ScanfDecoder

    with pytest.raises(ValueError):
        ScanfDecoder("no conversions here")
    with pytest.raises(ValueError):
        ScanfDecoder("%q")
    with pytest.raises(ValueError):
        ScanfDecoder("dangling %")


def test_runner_scanf_program():
    lines = [b"1609459200 login 1.5", b"garbage", b"1609459201 click 2.5"]
    out = run_program(
        'scanf("%d %s %f") | map {.0:ts, .1 as event, .2:num as v} | to_json', lines
    )
    assert out == [
        '{"timestamp":1609459200000,"labels":{"event":"login"},"values":{"v":1.5}}',
        '{"timestamp":1609459201000,"labels":{"event":"click"},"values":{"v":2.5}}',
    ]


# ---------------------------------------------------------------------------
# envoy
# ---------------------------------------------------------------------------

_ENVOY_LINE = (
    b'[2016-04-15T20:17:00.310Z] "POST /api/v1/locations HTTP/2" 204 - 154 0 226 100 '
    b'"10.0.35.28" "nsq2http" "cc21d9b0-cf5c-432b-8c7e-98aeb7988cd2" "locations" '
    b'"tcp://10.0.2.1:80"'
)


def test_envoy_default_format():
    from pq_ray.sources.structured import EnvoyLogDecoder

    got = EnvoyLogDecoder()(_ENVOY_LINE)
    assert got["start_time"] == "2016-04-15T20:17:00.310Z"
    assert got["method"] == "POST"
    assert got["path"] == "/api/v1/locations"
    assert got["protocol"] == "HTTP/2"
    assert got["response_code"] == "204"
    assert got["response_flags"] == "-"
    assert got["bytes_received"] == "154"
    assert got["bytes_sent"] == "0"
    assert got["duration"] == "226"
    assert got["upstream_service_time"] == "100"
    assert got["user_agent"] == "nsq2http"
    assert got["upstream_host"] == "tcp://10.0.2.1:80"


def test_envoy_short_form_and_mismatch():
    from pq_ray.sources.structured import EnvoyLogDecoder

    d = EnvoyLogDecoder()
    got = d(b'[2016-04-15T20:17:00.310Z] "GET / HTTP/1.1" 200 - 0 12 5 -')
    assert got["response_code"] == "200" and "user_agent" not in got
    with pytest.raises(DecodeError):
        d(b"not an envoy line")


def test_runner_envoy_program_timestamp_guess():
    out = run_program(
        "envoy | map {.start_time:ts, .response_code:num as code} | to_json",
        [_ENVOY_LINE],
    )
    assert out == ['{"timestamp":1460751420310,"labels":{},"values":{"code":204.0}}']


# ---------------------------------------------------------------------------
# redis
# ---------------------------------------------------------------------------


def test_redis_log_line():
    from pq_ray.sources.structured import RedisLogDecoder

    got = RedisLogDecoder()(b"1:M 01 Jan 2021 00:00:00.123 * Background saving started")
    assert got == {
        "pid": "1",
        "role": "master",
        "time_local": "01 Jan 2021 00:00:00.123",
        "level": "notice",
        "message": "Background saving started",
    }


def test_redis_levels_roles_and_mismatch():
    from pq_ray.sources.structured import RedisLogDecoder

    d = RedisLogDecoder()
    assert d(b"7:S 5 Feb 2022 10:11:12.000 # oops")["level"] == "warning"
    assert d(b"7:C 5 Feb 2022 10:11:12.000 . dbg")["role"] == "child"
    with pytest.raises(DecodeError):
        d(b"not a redis line")


def test_runner_redis_program_explicit_ts_format():
    lines = [
        b"1:M 01 Jan 2021 00:00:00.123 * Background saving started",
        b"1:M 01 Jan 2021 00:00:01.500 # Out of memory",
    ]
    out = run_program(
        'redis | map {.time_local:ts "%d %b %Y %H:%M:%S.%f", .level, .pid:num} | to_json',
        lines,
    )
    assert out == [
        '{"timestamp":1609459200123,"labels":{"level":"notice"},"values":{"pid":1.0}}',
        '{"timestamp":1609459201500,"labels":{"level":"warning"},"values":{"pid":1.0}}',
    ]


# ---------------------------------------------------------------------------
# to_promql formatter (the reference's planned PromQL formatter)
# ---------------------------------------------------------------------------


def test_promql_formatter_named_series_round_trips_through_prometheus_decoder():
    lines = [f"ts={1609459200 + i} event=e{i % 2} v={i}".encode() for i in range(4)]
    out = run_program(
        "logfmt | map {.ts:ts, .event, .v:num} | select v | to_promql", lines
    )
    # exposition lines: v{event="e0"} 0 1609459200999 ...
    assert out[0] == 'v{event="e0"} 0 1609459200999'
    assert all(line.startswith("v{") for line in out)
    # round-trip: our own prometheus decoder re-decodes the output
    from pq_ray.sources.structured import PrometheusDecoder

    back = PrometheusDecoder()(out[0].encode())
    assert back == {
        "__name__": "v",
        "event": "e0",
        "value": "0",
        "timestamp": "1609459200999",
    }


def test_promql_formatter_aggregated_and_scalar():
    lines = [f"ts={1609459200 + i} event=e{i % 2} v={i}".encode() for i in range(4)]
    out = run_program(
        "logfmt | map {.ts:ts, .event, .v:num} | select sum(v) | to_promql", lines
    )
    # aggregation drops __name__ → bare label block (documented choice)
    assert out[0] == "{} 0 1609459200999"
    assert run_program(
        "logfmt | map {.ts:ts, .v:num} | select 41 + 1 | to_promql", lines
    ) == ["42"]


def test_parser_accepts_to_promql_formatter():
    ast = parse_program("json | map {.ts:ts, .v:num} | select v | to_promql")
    assert ast.formatter == "to_promql"
