#!/usr/bin/env python
"""Deterministic scale-up of a driver fixture directory.

Produces an N× copy of every table with join-consistent key offsets —
copy c of a fact row points at copy c of its dimension rows, so join
selectivities, group sizes per key, and filter fractions are preserved
while table cardinality grows N×. Values, dates, text, and embeddings
are byte-identical across copies: near-dup/dedup operators therefore see
size-N duplicate groups (bounded quadratics), which is exactly the skew
shape their caps must absorb at scale.

Pure key arithmetic over the read-only source — no RNG, no timestamps —
so regenerating always yields the same bytes (safe to gitignore and
rebuild on demand). DuckDB does the heavy lifting; Spark isn't needed.

Usage: python tools/make_scale.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> <repo>/.scaledata/sf1.0, factor 10.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (table, {column: offset_group}) — columns in the same offset group get
# the same stride so foreign keys stay consistent across tables.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
# Source of each offset group's stride: max(column)+1 in the base table.
STRIDE_FROM = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_AS_IS = ["region", "nation"]


def make_scale(src: str, dst: str, factor: int) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {
        g: con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        for g, (t, col) in STRIDE_FROM.items()
    }
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keycols in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + _copy.c * {strides[keycols[c]]} AS {c}" if c in keycols else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS c) _copy) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


def ensure_scaled(src: str = "/root/testdata/sf0.1",
                  dst: str | None = None, factor: int = 10) -> str:
    """Idempotent entry for bench: build once, reuse after."""
    dst = dst or os.path.join(REPO, ".scaledata", "sf1.0")
    marker = os.path.join(dst, ".complete")
    if not os.path.exists(marker):
        make_scale(src, dst, factor)
        open(marker, "w").write(f"src={src} factor={factor}\n")
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".scaledata", "sf1.0")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scale(src, dst, factor)
    print(f"wrote {dst} ({factor}x of {src})")
