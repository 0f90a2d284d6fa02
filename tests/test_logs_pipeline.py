"""Distributed log-query pipeline parity: run_log_query over a sharded
log directory must produce the same formatted output as the local
runner fed the concatenated stream (the reference's stdin shape)."""

import numpy as np
import pytest

from pq_ray.pipelines.logs import run_log_query
from pq_ray.runner import run_program

PROGRAM = (
    r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
    r"| select sum(rps) by (host) | to_json"
)


def _write_logs(tmp_path, n_files=3, lines_per_file=40, seed=7):
    rng = np.random.default_rng(seed)
    t0 = 1_600_000_000
    all_lines = []
    paths = []
    t = t0
    for fi in range(n_files):
        lines = []
        for _ in range(lines_per_file):
            host = rng.choice(["web1", "web2", "db1"])
            rps = int(rng.integers(1, 500))
            lines.append(f"{t} {host} {rps}")
            t += int(rng.integers(0, 3))
        if fi == 1:
            lines.insert(5, "not a parseable line at all")  # Q11 drop
        p = tmp_path / f"app-{fi:02d}.log"
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
        all_lines.extend(lines)
    return paths, all_lines


@pytest.mark.parametrize(
    "program",
    [
        PROGRAM,
        r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
        r"| select rps | to_json",
        r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
        r'| select count_over_time(rps{host="web1"}[3s]) | to_json',
        r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
        r"| select max(rps) by (host) | to_promapi",
    ],
)
def test_log_query_matches_local_runner(ray_session, tmp_path, program):
    paths, all_lines = _write_logs(tmp_path)
    local = run_program(program, all_lines)
    dist = run_log_query(str(tmp_path), program, num_buckets=4)
    assert dist == local


def test_log_query_since_until(ray_session, tmp_path):
    paths, all_lines = _write_logs(tmp_path)
    # globally ts-ordered stream → per-file until-termination == local
    since = 1_600_000_000_050 // 1  # ms
    until = 1_600_000_000_110
    local = run_program(PROGRAM, all_lines, since_ms=since, until_ms=until)
    dist = run_log_query(str(tmp_path), PROGRAM, since_ms=since, until_ms=until,
                         num_buckets=4)
    assert dist == local


def test_log_query_single_big_file_multi_split(ray_session, tmp_path):
    """One file forced through many byte-range splits (tiny split_bytes)
    must equal the local runner byte for byte — lines straddling split
    boundaries are owned by exactly one split, line numbers and arrival
    order survive the offset fixup."""
    rng = np.random.default_rng(13)
    t = 1_600_000_000
    lines = []
    for _ in range(500):
        host = rng.choice(["web1", "web2", "db1", "cache9"])
        rps = int(rng.integers(1, 500))
        lines.append(f"{t} {host} {rps}")
        t += int(rng.integers(0, 3))
    lines.insert(100, "unparseable junk @@@@")  # Q11 drop mid-file
    p = tmp_path / "big.log"
    p.write_text("\n".join(lines) + "\n")

    local = run_program(PROGRAM, lines)
    for split_bytes in (256, 1024, 10**9):
        dist = run_log_query(
            str(p), PROGRAM, num_buckets=4, split_bytes=split_bytes
        )
        assert dist == local, split_bytes
    # __line__ parity: the line-number pseudo-metric must reflect
    # file-global numbering across splits
    prog_line = (
        r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
        r"| select max(__line__) | to_json"
    )
    assert run_log_query(str(p), prog_line, num_buckets=4, split_bytes=512) == \
        run_program(prog_line, lines)


def test_read_split_lines_ownership(tmp_path):
    """Unit-level line-ownership contract: every line is owned by
    exactly one split for ANY split size, including boundaries landing
    exactly on newlines, mid-line, and a file without trailing newline."""
    from pq_ray.pipelines.logs import _read_split_lines

    for content in (
        b"aaa\nbbbb\ncc\ndddddd\ne\n",
        b"aaa\nbbbb\ncc\ndddddd\ne",          # no trailing newline
        b"single line no newline",
        b"\n\nx\n\n",                          # empty lines
    ):
        p = tmp_path / "f.log"
        p.write_bytes(content)
        expected = content.splitlines()
        size = len(content)
        for split in range(1, size + 2):
            got = []
            for s in range(0, size, split):
                got.extend(_read_split_lines(str(p), s, min(s + split, size)))
            assert got == expected, (content, split)


def test_log_query_requires_query_stage(ray_session, tmp_path):
    paths, _ = _write_logs(tmp_path)
    with pytest.raises(ValueError):
        run_log_query(str(tmp_path), r"/(\w+)/ | to_json")
