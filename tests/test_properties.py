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


# ---------------------------------------------------------------------------
# SimHash banding recall guarantee (pure-Python model of dedup.py's plan)
# ---------------------------------------------------------------------------


@settings(deadline=None)
@given(
    base=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
def test_simhash_band_pigeonhole_recall(base, flips):
    """Any pair within Hamming ≤ 3 of a 64-bit fingerprint shares at least
    one of the 4×16-bit bands — the pigeonhole guarantee that makes the
    equi-join candidate generation in dedup_simhash_pairs LOSSLESS for the
    HAMMING_MAX threshold (not an approximation)."""
    from gluettalax_spark.operators.dedup import (
        HAMMING_MAX,
        SIMHASH_BAND_BITS,
        SIMHASH_BANDS,
    )

    assert len(flips) <= HAMMING_MAX
    other = base
    for b in flips:
        other ^= 1 << b
    # Arithmetic-shift-and-mask band extraction, as both engines do it.
    def bands(v):
        return [
            (v >> (k * SIMHASH_BAND_BITS)) & 0xFFFF for k in range(SIMHASH_BANDS)
        ]

    assert any(x == y for x, y in zip(bands(base), bands(other)))


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_simhash_bands_reassemble(v):
    """The 4 bands partition all 64 bits: reassembling them yields the
    original signed fingerprint (no bit lost or double-counted)."""
    from gluettalax_spark.operators.dedup import SIMHASH_BAND_BITS, SIMHASH_BANDS

    acc = 0
    for k in range(SIMHASH_BANDS):
        acc |= ((v >> (k * SIMHASH_BAND_BITS)) & 0xFFFF) << (k * SIMHASH_BAND_BITS)
    # Reinterpret the unsigned accumulator as signed 64-bit.
    if acc >= 2**63:
        acc -= 2**64
    assert acc == v


# -- rank.py closed-form ntile ---------------------------------------------
#
# The Spark-column form is checked against F.ntile over sampled (n, k) in
# tests/test_rank.py; this generalizes the FORMULA itself against a direct
# construction of the ANSI assignment (first n%k tiles get n//k+1 rows)
# for every rank of arbitrary (n, k).


@given(n=st.integers(1, 5000), k=st.integers(1, 64))
@settings(max_examples=300)
def test_ntile_closed_form_matches_ansi_assignment(n, k):
    base, rem = divmod(n, k)
    expect = []
    for tile_no in range(1, k + 1):
        size = base + 1 if tile_no <= rem else base
        expect += [tile_no] * size

    cut = rem * (base + 1)

    def closed_form(rn: int) -> int:  # mirror of rank.ntile_from_rank
        if rn <= cut:
            return (rn - 1) // (base + 1) + 1
        return rem + (rn - cut - 1) // max(base, 1) + 1

    got = [closed_form(rn) for rn in range(1, n + 1)]
    assert got == expect
