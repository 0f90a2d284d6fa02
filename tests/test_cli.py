"""CLI surface: the pq-compatible entry point in both modes — stdin
(local single-process, the reference's UX) and --files (distributed
engine over a log directory)."""

import numpy as np

from pq_ray.cli import main
from pq_ray.runner import run_program

PROGRAM = (
    r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
    r"| select sum(rps) by (host) | to_json"
)


def _write_logs(tmp_path, n_files=2, lines_per_file=30, seed=3):
    rng = np.random.default_rng(seed)
    t = 1_600_000_000
    all_lines = []
    for fi in range(n_files):
        lines = []
        for _ in range(lines_per_file):
            host = rng.choice(["web1", "web2"])
            lines.append(f"{t} {host} {int(rng.integers(1, 100))}")
            t += int(rng.integers(0, 3))
        (tmp_path / f"app-{fi:02d}.log").write_text("\n".join(lines) + "\n")
        all_lines.extend(lines)
    return all_lines


def test_cli_stdin_mode(tmp_path, capsys, monkeypatch):
    import io
    import sys

    all_lines = _write_logs(tmp_path)
    data = ("\n".join(all_lines) + "\n").encode()
    monkeypatch.setattr(sys, "stdin", io.TextIOWrapper(io.BytesIO(data)))
    rc = main([PROGRAM])
    out = capsys.readouterr().out.rstrip("\n").splitlines()
    assert rc == 0
    assert out == run_program(PROGRAM, all_lines)


def test_cli_files_mode_matches_local(ray_session, tmp_path, capsys):
    """--files runs the distributed engine and (inside an existing Ray
    session) must not tear that session down."""
    import ray

    all_lines = _write_logs(tmp_path)
    rc = main([PROGRAM, "--files", str(tmp_path)])
    out = capsys.readouterr().out.rstrip("\n").splitlines()
    assert rc == 0
    assert out == run_program(PROGRAM, all_lines)
    assert ray.is_initialized()  # the caller's session survived


def test_cli_parse_error_exit_code(capsys, monkeypatch):
    import io
    import sys

    monkeypatch.setattr(sys, "stdin", io.TextIOWrapper(io.BytesIO(b"")))
    rc = main(["| select |"])
    assert rc != 0


def test_cli_extensions_flag_new_functions(tmp_path, capsys, monkeypatch):
    """-x turns on the extension grammar end-to-end: offset shifts the
    grid one interval later, round() applies per sample."""
    import io
    import sys

    all_lines = _write_logs(tmp_path)
    data = ("\n".join(all_lines) + "\n").encode()
    base_prog = (
        r"/(\d+) (\w+) (\d+)/ | map {.0:ts, .1 as host, .2:num as rps} "
        r"| select round(sum(rps) by (host)) | to_json"
    )
    off_prog = base_prog.replace("sum(rps)", "sum(rps offset 1s)")

    # without -x: extension names must fail exactly like unknown parsers
    monkeypatch.setattr(sys, "stdin", io.TextIOWrapper(io.BytesIO(data)))
    assert main([base_prog]) != 0
    capsys.readouterr()

    monkeypatch.setattr(sys, "stdin", io.TextIOWrapper(io.BytesIO(data)))
    rc = main([base_prog, "-x"])
    base_out = capsys.readouterr().out.rstrip("\n").splitlines()
    assert rc == 0 and base_out

    monkeypatch.setattr(sys, "stdin", io.TextIOWrapper(io.BytesIO(data)))
    rc = main([off_prog, "-x"])
    off_out = capsys.readouterr().out.rstrip("\n").splitlines()
    assert rc == 0
    # offset 1s: same (host, value) stream, timestamps one interval later
    import json

    def triples(lines):
        out = []
        for l in lines:
            for item in json.loads(l)["result"]:
                ts, v = item["value"]
                out.append((round(ts, 3), item["metric"]["host"], v))
        return out

    base_t = triples(base_out)
    off_t = triples(off_out)
    assert [(round(t + 1.0, 3), h, v) for t, h, v in base_t] == off_t
