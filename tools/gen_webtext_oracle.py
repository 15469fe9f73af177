#!/usr/bin/env python
"""Materialize the expected webtext edge list WITHOUT Spark.

The synthetic corpus is seed-pure (sources/synth.py: page i depends only on
(seed, i, n)), so the full expected edge table for the driver's
``webtext_edges`` query is derivable from the pure-Python reference path:

    gen_page → extract_links_py → closed-world filter → distinct
    → xxhash64 ids (functions/hashing.py, bit-identical to F.xxhash64)

The result is written to tests/data/webtext_edges_n{N}_seed{S}.parquet; the
DuckDB oracle reads it via read_parquet().  tests/test_webtext.py asserts the
committed file equals a fresh regeneration (guards against drift) and the
Spark pipeline output (guards the engine).

Usage: python tools/gen_webtext_oracle.py [n=2000] [seed=42]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq

from pregel_rs_spark.functions.extract import extract_links_py
from pregel_rs_spark.functions.hashing import url_id_py
from pregel_rs_spark.sources.synth import gen_page, page_url

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def expected_edges(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Distinct (subject, object) xxhash64 id pairs, closed-world, no
    self-links — mirrors functions.extract.pages_to_edges exactly."""
    urls = {page_url(i, n) for i in range(n)}
    pairs: set[tuple[int, int]] = set()
    for i in range(n):
        p = gen_page(i, n, seed)
        src = p["url"]
        for dst in extract_links_py(p["html"], src):
            if dst != src and dst in urls:
                pairs.add((url_id_py(src), url_id_py(dst)))
    return sorted(pairs)


def write(n: int, seed: int = 42) -> str:
    pairs = expected_edges(n, seed)
    path = os.path.abspath(
        os.path.join(OUT_DIR, f"webtext_edges_n{n}_seed{seed}.parquet")
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = pa.table(
        {
            "subject": pa.array([a for a, _ in pairs], pa.int64()),
            "object": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    pq.write_table(table, path)
    print(f"{len(pairs)} expected edges -> {path}")
    return path


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    write(n, seed)
