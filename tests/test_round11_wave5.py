"""Round 11, wave 5: property-test the integer-PageRank recurrence.

The oracle (8 unrolled MATERIALIZED CTEs) and the Spark loop both claim
to implement r' = 0.15·SCALE//n + (85·Σ⌊r/d⌋)//100 over the support-2
co-occurrence graph. The Spark↔oracle equality is pinned at fixture SF in
test_graph_analytics; THIS file attacks the other side: on random small
basket tables, the DuckDB oracle must equal an independent pure-Python
integer replay — no Spark in the loop, so dozens of examples are cheap,
and a bug in the SQL unrolling (wrong round order, a float sneaking in,
`//` vs DIV divergence) can't hide behind a matching Spark twin."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gluettalax_spark.operators.graph import (
    _PAGERANK_ORACLE,
    _PR_ITERS,
    _PR_SCALE,
    _PR_TELEPORT_E12,
    _TRI_MIN_SUPPORT,
)

# Random basket tables: up to 12 orders over a 8-part universe, so the
# support-2 prune keeps a nontrivial but small graph.
_baskets = st.lists(
    st.lists(st.integers(min_value=1, max_value=8), min_size=2, max_size=5),
    min_size=2,
    max_size=12,
)


def _python_pagerank(baskets: list[list[int]]):
    pair_count: dict[tuple[int, int], int] = defaultdict(int)
    for ps_raw in baskets:
        ps = sorted(set(ps_raw))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    edges = [e for e, c in pair_count.items() if c >= _TRI_MIN_SUPPORT]
    nodes = sorted({n for e in edges for n in e})
    if not nodes:
        return {}
    deg: dict[int, int] = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    n = len(nodes)
    base = _PR_TELEPORT_E12 // n
    r = {v: _PR_SCALE // n for v in nodes}
    for _ in range(_PR_ITERS):
        nxt: dict[int, int] = defaultdict(int)
        for a, b in edges:
            nxt[a] += r[b] // deg[b]
            nxt[b] += r[a] // deg[a]
        r = {v: base + (85 * nxt[v]) // 100 for v in nodes}
    mass = sum(r.values())
    return {v: (r[v], deg[v], mass) for v in nodes}


@settings(max_examples=25, deadline=None)
@given(baskets=_baskets)
def test_pagerank_oracle_equals_python_replay(tmp_path_factory, baskets):
    rows = []
    for oid, ps in enumerate(baskets):
        for p in ps:
            rows.append((oid, p))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = tmp_path_factory.mktemp("pr")
    li.to_parquet(f"{d}/lineitem.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    got = con.execute(_PAGERANK_ORACLE).fetchall()
    con.close()
    want = _python_pagerank(baskets)
    top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [
        (v, rk, dg, ms) for v, (rk, dg, ms) in top
    ]
    if got:
        # Mass conservation up to floor losses: strictly ≤ SCALE, and the
        # loss is bounded by iterations × (per-edge + per-node floors).
        mass = got[0][3]
        n_nodes = len(want)
        n_dir_edges = sum(dg for _, (_, dg, _) in want.items())
        assert mass <= _PR_SCALE
        assert mass >= _PR_SCALE - _PR_ITERS * (n_dir_edges + 2 * n_nodes) - n_nodes
