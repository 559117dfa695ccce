"""Property-based tests (Hypothesis) for the pure-Python surfaces:
the CLI usage-grammar parser and the duration humanizer.

The reference ships 14 example-based parser cases (test_parse_args.py,
ported in tests/test_cli.py); these generalize them — any generated
argv consistent with the grammar must round-trip, and the parser must
never crash with anything but InvalidOption.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gluettalax_spark.cli import parse_args, parse_usage
from gluettalax_spark.exceptions import InvalidOption
from gluettalax_spark.functions.scalars import format_time

# Identifier-ish names that can't be confused with option syntax.
_name = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_value = st.from_regex(r"[A-Za-z0-9_.:*%/]{1,12}", fullmatch=True)


@given(
    req=st.lists(_name, max_size=3, unique=True),
    opts=st.lists(_name, min_size=0, max_size=3, unique=True),
    flag_mask=st.lists(st.booleans(), min_size=3, max_size=3),
)
def test_parse_usage_inverts_grammar(req, opts, flag_mask):
    """parse_usage recovers exactly the structure the usage string encodes."""
    flags = [n for n, f in zip(opts, flag_mask) if f]
    strs = [n for n, f in zip(opts, flag_mask) if not f]
    usage = " ".join(
        [f"<{r}>" for r in req]
        + [f"[--{n}]" for n in flags]
        + [f"[--{n}=value]" for n in strs]
    )
    required, optionals, options = parse_usage(usage)
    assert required == [f"<{r}>" for r in req]
    assert optionals == []
    assert {n for n, t in options.items() if t is bool} == set(flags)
    assert {n for n, t in options.items() if t is str} == set(strs)


@given(
    positional=st.lists(_value, min_size=2, max_size=2),
    k=_name,
    v=_value,
    use_eq=st.booleans(),
    flag_on=st.booleans(),
)
@settings(max_examples=200)
def test_parse_args_roundtrip(positional, k, v, use_eq, flag_on):
    """Generated argv consistent with a two-positional usage parses back
    to the same values, in = and space forms alike, flags independent."""
    usage = "<database> <table> [--verbose] [--key=value]"
    argv = ["cmd", *positional]
    if flag_on:
        argv.append("--verbose")
    argv.extend([f"--{k}={v}"] if use_eq else [f"--{k}", v])
    got = parse_args(argv, usage, {"op_verbose": False})
    *pos, kargs = got
    assert pos == positional
    assert kargs["op_verbose"] is flag_on
    assert kargs[k] == v  # all values stay strings
    assert isinstance(kargs[k], str)


@given(argv_tail=st.lists(st.text(min_size=1, max_size=15).filter(lambda s: "\x00" not in s), max_size=5))
@settings(max_examples=300)
def test_parse_args_total(argv_tail):
    """The parser never raises anything except InvalidOption — arbitrary
    argv is either parsed or rejected with the domain error."""
    usage = "<database> [pattern] [--noheaders] [--key=value]"
    try:
        parse_args(["cmd", *argv_tail], usage, {"op_noheaders": False})
    except InvalidOption:
        pass


@given(seconds=st.integers(min_value=-10**7, max_value=10**7))
def test_format_time_total_and_consistent(seconds):
    out = format_time(seconds)
    assert out
    if seconds == 0:
        assert out == "0s"
        return
    # Parse it back: the components must sum to the truncated input.
    total = 0
    for part in out.split(" "):
        unit = part[-1]
        qty = int(part[:-1])
        total += qty * {"d": 86400, "h": 3600, "m": 60, "s": 1}[unit]
    assert total == int(seconds)
    # Signs are uniform and match the input's sign.
    signs = {p.startswith("-") for p in out.split(" ")}
    assert signs == {seconds < 0}
