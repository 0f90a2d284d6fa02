"""Golden conformance: run every reference e2e scenario
(/root/reference/tests/scenarios/<case>/{args.json,input,output}) through
our engine and byte-compare the output (the reference harness:
tests/e2e.rs:15-74)."""

import json
import os

import pytest

from pq_ray.model import parse_duration_ms, try_parse_time_ms
from pq_ray.runner import run_program

SCENARIOS_DIR = "/root/reference/tests/scenarios"
CASES = sorted(os.listdir(SCENARIOS_DIR)) if os.path.isdir(SCENARIOS_DIR) else []


def _parse_args(args: list[str]):
    """args.json is ["pq", "<program>", "--interval", "1s", ...]."""
    program = args[1]
    opts = {}
    i = 2
    while i < len(args):
        flag = args[i]
        val = args[i + 1]
        i += 2
        if flag in ("--interval", "-I"):
            opts["interval_ms"] = parse_duration_ms(val)
        elif flag in ("--lookback", "-b"):
            opts["lookback_ms"] = parse_duration_ms(val)
        elif flag in ("--since", "-s"):
            opts["since_ms"] = try_parse_time_ms(val)
        elif flag in ("--until", "-u"):
            opts["until_ms"] = try_parse_time_ms(val)
    return program, opts


@pytest.mark.parametrize("case", CASES)
def test_scenario(case):
    d = os.path.join(SCENARIOS_DIR, case)
    with open(os.path.join(d, "args.json")) as f:
        args = json.load(f)
    program, opts = _parse_args(args)
    with open(os.path.join(d, "input"), "rb") as f:
        lines = f.read().splitlines()
    with open(os.path.join(d, "output")) as f:
        expected = f.read().splitlines()

    got = run_program(program, lines, **opts)
    assert got == expected, (
        f"{case}: mismatch\n--- got ---\n" + "\n".join(got) +
        "\n--- want ---\n" + "\n".join(expected)
    )
