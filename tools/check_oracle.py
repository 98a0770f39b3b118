"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares: row count, column names
(sorted), and order-insensitive values. Floats must match to 1e-9 rel
(the engine's decimal-exact policy should make them byte-equal; the
tolerance only localizes a failure, mismatches are still reported).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # unify int flavors
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return list(a) == list(b)
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if len(sdf) != len(odf):
        errs.append(f"row count differ: spark={len(sdf)} oracle={len(odf)}")
        return errs
    s, o = norm(sdf), norm(odf)
    n_bad = 0
    for i in range(len(s)):
        for c in s.columns:
            if not cells_equal(s.at[i, c], o.at[i, c]):
                n_bad += 1
                if n_bad <= 3:
                    errs.append(f"row {i} col {c}: spark={s.at[i, c]!r} oracle={o.at[i, c]!r}")
    if n_bad > 3:
        errs.append(f"... {n_bad} mismatched cells total")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from embulk_input_mixpanel_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # aux entries (subsumed by a main entry's oracle CTE, kept out of the
    # driver's 50-row gate) run when explicitly named or with --aux
    from embulk_input_mixpanel_spark import workloads

    if "--aux" in only:
        only.discard("--aux")
        qs = {**qs, **workloads.AUX_QUERIES}
        oracles = {**oracles, **workloads.AUX_ORACLE_SQL}
    else:
        for name in only & set(workloads.AUX_QUERIES):
            qs[name] = workloads.AUX_QUERIES[name]
            if name in workloads.AUX_ORACLE_SQL:
                oracles[name] = workloads.AUX_ORACLE_SQL[name]
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        errs = compare(name, sdf, odf)
        if errs:
            print(f"FAIL  {name}:")
            for e in errs:
                print(f"      {e}")
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        return 1
    print(f"all {len([q for q in qs if not only or q in only])} queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
