"""Oracle type hardening: every oracle SQL must produce only
driver-hash-safe DuckDB types.

The driver compares Spark vs DuckDB results with an order-insensitive
value hash over a pandas fetch.  Types that round-trip differently
through pandas than Spark's closest type poison the hash even when the
values are numerically identical:

- HUGEINT / UHUGEINT — DuckDB's 128-bit sum(INTEGER) result; pandas
  renders it as object/float while Spark's BIGINT renders as int64
  (this exact class of bug made lang_stats the one red row in
  CORRECTNESS_r02).
- DECIMAL — fetched as Python Decimal objects; Spark-side queries cast
  money results to DOUBLE, so the oracle must too.

This test DESCRIBEs every oracle (no execution — cheap) and then
actually executes each at sf0.001 to catch runtime-only failures such
as CAST('' AS INTEGER) on an empty regex extract.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import duck_con

SF_DIR = "/root/testdata/sf0.001"

UNSAFE_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")

ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_are_hash_safe(con, name):
    sql = ORACLES[name]
    cols = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    bad = [
        (cname, ctype)
        for cname, ctype, *_ in cols
        if any(ctype.upper().startswith(p) for p in UNSAFE_TYPE_PREFIXES)
    ]
    assert not bad, (
        f"oracle '{name}' yields driver-hash-unsafe DuckDB types {bad}; "
        "wrap the expression in CAST(... AS BIGINT/DOUBLE) to match Spark"
    )


@pytest.mark.parametrize(
    "name",
    [
        # the nested two-cascade oracles take ~40 s each in DuckDB:
        # default-skipped (check_all executes them for real)
        pytest.param(n, marks=pytest.mark.slow)
        if n in ("ingest_two_batch", "ingest_two_batch_indexed")
        else n
        for n in sorted(ORACLES)
    ],
)
def test_oracle_executes(con, name):
    # Runtime check: DESCRIBE only binds; CAST errors on '' appear at
    # execution. sf0.001 keeps even the shingle self-joins fast.
    con.execute(f"SELECT count(*) FROM ({ORACLES[name]})").fetchone()
