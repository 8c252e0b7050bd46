#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Usage:  python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), and compares schema/rows/values exactly (order-
sensitive, columns sorted by name). Dev-only tool — the driver runs its own
equivalent.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir: Path, name: str):
    ds = outdir / name
    files = sorted(ds.glob("*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def values_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (float, int)):
        if a == b:
            return True
        return math.isclose(a, float(b), rel_tol=1e-12, abs_tol=1e-12)
    if isinstance(a, int) and isinstance(b, float):
        return values_equal(float(a), b)
    return a == b


def main():
    sfdir, outdir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    names = sorted(set(p.name for p in outdir.iterdir() if p.is_dir()) | set(oracle))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spark_tbl = load_spark(outdir, name)
        if spark_tbl is None:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS_ONLY" if spark_tbl.num_rows >= 0 else "EMPTY"
            print(f"{status}  {name}: {spark_tbl.num_rows} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            duck = con.execute(oracle[name])
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Round-1 lesson: the driver's pandas-based comparer crashes when
        # sorting list/struct-typed columns (a3/n3 regressions) even though
        # this tool's tuple compare handles them — treat nested output
        # types in an oracled query as a failure so it never ships.
        import pyarrow.types as pat
        nested = [f.name for f in spark_tbl.schema
                  if pat.is_nested(f.type)]
        if nested:
            print(f"FAIL  {name}: nested-typed columns {nested} would crash "
                  f"the driver's comparer — serialize to scalars")
            n_fail += 1
            continue
        spark_cols = spark_tbl.column_names
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL  {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        order = sorted(spark_cols)
        spark_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in order]))
        didx = {c: i for i, c in enumerate(duck_cols)}
        duck_rows2 = [tuple(r[didx[c]] for c in order) for r in duck_rows]
        if len(spark_rows) != len(duck_rows2):
            print(f"FAIL  {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows2)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(spark_rows, duck_rows2)):
            if not all(values_equal(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"FAIL  {name}: first diff at row {bad[0]} (cols {order}):\n"
                  f"      spark={bad[1]}\n      duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spark_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
