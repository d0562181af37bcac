#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
dumped by graft.Verify, run the declared DuckDB oracle SQL over the same
parquet tables and compare (schema-insensitively: columns sorted by
name, rows sorted, exact value equality).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [emitJson]

With `emitJson`, also writes the per-query verdicts in the driver's
CORRECTNESS_rN.json schema (rows/schema/hash match, row counts, err;
rows-only queries as "no_oracle") — the committed local artifact
(CORRECTNESS_LOCAL_rN.json) that insures the round's correctness
record against driver-side artifact plumbing failures.

Dev tool only — the real gate is driver-side.
"""
import json
import os
import sys
import threading
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, emit_path: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; Spark-written xR rehearsal
        # fixtures are part-file DIRECTORIES — glob accordingly
        path = Path(sf_dir) / f"{t}.parquet"
        pattern = f"{path}/*.parquet" if path.is_dir() else str(path)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    # Python-computed oracles (round 18): the xxhash64-based family
    # has no portable-SQL restatement, but the ORACLE itself need not
    # be SQL — py_oracles reimplements the XXH64 kernel + pipeline
    # independently, flipping those queries from rows-only to
    # value-exact in the committed local artifact. Only applied to
    # queries that (a) have a verify dump and (b) carry no SQL oracle.
    try:
        sys.path.insert(0, str(Path(__file__).parent))
        import py_oracles
        py = {n: f for n, f in py_oracles.REGISTRY.items()
              if n not in oracle and (Path(out_dir) / n).exists()}
    except Exception as e:  # missing numpy etc. — degrade to rows-only
        print(f"(py_oracles unavailable: {e})")
        py = {}
    # Opt-in watchdog for the xR fixture sweeps: some oracle SQL
    # restatements are pair-CTE/brute-force quadratic on the DuckDB
    # side (fine at the driver's sf0.01 gate, hours at x30). With
    # GRAFT_ORACLE_TIMEOUT_S set, a query whose ORACLE exceeds the
    # budget is reported SKIPPED (DuckDB-side cost, not a result
    # mismatch) instead of hanging the sweep. Unset = exact old
    # behavior; the driver's per-round gate never sets this.
    timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_S", "0") or 0)

    def run_oracle(sql: str):
        if timeout_s <= 0:
            return con.execute(sql).fetchdf()
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()

    # per-query record in the DRIVER's CORRECTNESS_rN.json schema —
    # emitted to `emit_path` when given, so every round carries a
    # committed machine-readable correctness artifact even when the
    # driver-side plumbing drops one (round 16: CORRECTNESS_r16.json
    # arrived empty while the same session's bench ran 100/100 clean)
    results = {}

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    n_bad = 0
    skipped = []
    for name in sorted(set(oracle) | set(py)):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"MISSING  {name} (no verify output)")
            record(name, err="no verify output")
            n_bad += 1
            continue
        got = pd.read_parquet(qdir)
        try:
            want = py[name](con, sf_dir) if name in py \
                else run_oracle(oracle[name])
        except duckdb.InterruptException:
            print(f"SKIPPED  {name} (oracle exceeded {timeout_s:.0f}s budget)")
            record(name, spark_rows=len(got),
                   err=f"oracle exceeded {timeout_s:.0f}s budget (skipped)")
            skipped.append(name)
            continue
        except Exception as e:
            if timeout_s > 0 and "INTERRUPT" in str(e).upper():
                print(f"SKIPPED  {name} (oracle exceeded {timeout_s:.0f}s budget)")
                record(name, spark_rows=len(got),
                       err=f"oracle exceeded {timeout_s:.0f}s budget (skipped)")
                skipped.append(name)
                continue
            print(f"ORACLE-ERR {name}: {e}")
            record(name, spark_rows=len(got), err=f"oracle error: {e}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"COLS     {name}: got {list(g.columns)} want {list(w.columns)}")
            record(name, rows_match=len(g) == len(w), schema_match=False,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(w))
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"ROWS     {name}: got {len(g)} want {len(w)}")
            record(name, rows_match=False, schema_match=True,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(w))
            n_bad += 1
            continue
        # The driver's hash gate is TYPE-strict (DuckDB SUM(BIGINT) ->
        # HUGEINT != Spark int64 hashes differently even when values
        # match) — mirror that here.
        tmism = [f"{c}: got {g[c].dtype} want {w[c].dtype}"
                 for c in g.columns if g[c].dtype != w[c].dtype]
        if tmism:
            print(f"TYPES    {name}: {tmism}")
            record(name, rows_match=True, schema_match=True,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(w))
            n_bad += 1
            continue
        mism = []
        for c in g.columns:
            gc, wc = g[c], w[c]
            try:
                eq = (gc.isna() & wc.isna()) | (gc == wc)
                # exact match required (driver hashes values); report
                # near-misses distinctly to speed up debugging
                if not eq.all():
                    import numpy as np
                    if pd.api.types.is_float_dtype(gc) and pd.api.types.is_float_dtype(wc):
                        close = ((gc.isna() & wc.isna())
                                 | (abs(gc - wc) <= 1e-9 * (1 + abs(wc)))).all()
                        mism.append(f"{c}{' (float-close)' if close else ''}")
                    else:
                        mism.append(c)
            except Exception as e:
                mism.append(f"{c} ({e})")
        if mism:
            print(f"VALUES   {name}: mismatch in {mism}")
            bad = [c.split()[0] for c in mism]
            for c in bad[:2]:
                d = g[g[c].astype(str) != w[c].astype(str)]
                idx = d.index[:3]
                for i in idx:
                    print(f"    {c}[{i}]: got={g[c][i]!r} want={w[c][i]!r}")
            record(name, rows_match=True, schema_match=True,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(w))
            n_bad += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
            record(name, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=len(g), oracle_rows=len(w))
    # rows-only queries (no portable oracle SQL): the driver records a
    # weaker rows-only check — mirror its "no_oracle" entries
    for qdir in sorted(Path(out_dir).iterdir()):
        if qdir.is_dir() and qdir.name not in oracle and qdir.name not in py:
            try:
                n = len(pd.read_parquet(qdir))
            except Exception as e:
                record(qdir.name, err=f"unreadable verify output: {e}")
                continue
            record(qdir.name, spark_rows=n, err="no_oracle")
    if emit_path:
        Path(emit_path).write_text(json.dumps(results, indent=1, sort_keys=True))
        print(f"wrote {emit_path} ({len(results)} queries)")
    n_run = len(oracle) + len(py) - len(skipped)
    tail = f" ({len(skipped)} skipped on oracle budget: {', '.join(skipped)})" if skipped else ""
    print(f"\n{n_run - n_bad}/{n_run} queries match{tail}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
