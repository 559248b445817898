#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify) and
compares it against the DuckDB result of <out_dir>/oracle_sql.json's
SQL over <sf_dir>/*.parquet: column names (sorted), row count, and
values (rows sorted by all columns). Exact compare; floats compared
bit-exactly after float64 normalization — the engine queries are
designed so results are deterministic (decimal-exact aggregation,
per-row double math, total ORDER BY).
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def normalize(rel, cols):
    """Rows as sorted tuples of (type-tag, value), matching the driver's
    arrow-typed hash: values go through pyarrow, so DuckDB HUGEINT /
    DECIMAL surface as decimal.Decimal (!= Spark's int/float) while
    integer widths (int8..int64) all collapse to Python int."""
    out = []
    for d in rel.arrow().to_pylist():
        r = []
        for c in cols:
            v = d[c]
            if isinstance(v, float):
                r.append(("f", repr(v)))
            elif hasattr(v, "isoformat"):
                r.append(("t", v.isoformat()))
            elif isinstance(v, (list, tuple)):
                r.append(("l", tuple(v)))
            else:
                r.append((type(v).__name__, v))
        out.append(tuple(r))
    out.sort(key=repr)
    return out


def main(out_dir, sf_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    names = sorted(d.name for d in out.iterdir() if d.is_dir())
    for name in names:
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rel = con.sql(f"SELECT {', '.join(got_cols)} FROM got")
            got_rows = normalize(got_rel, got_cols)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check: {len(got_rows)} rows)")
            continue
        try:
            exp = con.sql(oracle[name])
            exp_cols = sorted(exp.columns)
            exp_rel = con.sql(f"SELECT {', '.join(exp_cols)} FROM exp")
            exp_rows = normalize(exp_rel, exp_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
        elif got_rows != exp_rows:
            bad = sum(1 for a, b in zip(got_rows, exp_rows) if a != b)
            print(f"FAIL {name}: {bad}/{len(got_rows)} rows differ")
            for a, b in zip(got_rows, exp_rows):
                if a != b:
                    print(f"  spark : {a}\n  duckdb: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got_rows)} rows")
            n_pass += 1
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        print(f"FAIL {m}: oracle declared but no spark output")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
