#!/usr/bin/env python3
"""Time each declared DuckDB oracle query against a scale-factor dir:
min of N runs per query, one JSON line of per-query seconds. The
Spark-vs-DuckDB pairing table in BASELINE.md is produced from this
plus graft.Bench's steady pass.

Usage: python3 tools/time_oracle.py <sfDir> <oracleSqlJson> [runs]
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, oracle_json: str, runs: int = 2) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(oracle_json).read_text())
    out = {}
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            con.execute(oracle[name]).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    print(json.dumps({"sf": sf_dir, "runs": runs,
                      "total": round(sum(out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
