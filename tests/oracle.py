"""DuckDB differential-testing helper mirroring the driver's t2 check:
row-count + column names + order-insensitive value comparison.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows, cols):
    """Sort columns by name, stringify values (floats rounded) → sortable row tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, approx_cols: dict[str, float] | None = None):
    """Compare a Spark DataFrame against DuckDB SQL on the same parquet dir.

    approx_cols: {col: rel_tol} — those columns are compared with relative
    tolerance after sorting on the exact columns (for approx aggregates).
    """
    con = duck_con(sf_dir)
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row-count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    if not approx_cols:
        a = _normalize(spark_rows, spark_cols)
        b = _normalize(oracle_rows, oracle_cols)
        if a != b:
            diff_a = [r for r in a if r not in set(map(tuple, b))][:5]
            diff_b = [r for r in b if r not in set(map(tuple, a))][:5]
            raise AssertionError(
                f"value mismatch (cols sorted={sorted(spark_cols)}):\n"
                f"  spark-only rows (≤5): {diff_a}\n  oracle-only rows (≤5): {diff_b}"
            )
    else:
        exact = [c for c in sorted(spark_cols) if c not in approx_cols]
        si = {c: spark_cols.index(c) for c in spark_cols}
        oi = {c: oracle_cols.index(c) for c in oracle_cols}
        skey = sorted(spark_rows, key=lambda r: tuple(str(r[si[c]]) for c in exact))
        okey = sorted(oracle_rows, key=lambda r: tuple(str(r[oi[c]]) for c in exact))
        for sr, orow in zip(skey, okey):
            for c in exact:
                assert str(sr[si[c]]) == str(orow[oi[c]]), f"{c}: {sr[si[c]]} != {orow[oi[c]]}"
            for c, tol in approx_cols.items():
                sv, ov = float(sr[si[c]]), float(orow[oi[c]])
                assert math.isclose(sv, ov, rel_tol=tol, abs_tol=tol), f"{c}: {sv} !≈ {ov}"
