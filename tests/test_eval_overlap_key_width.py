"""Cross-engine parity for text_eval_overlap at BOTH gram-key widths
(VERDICT r8 item 7): the default 16-hex (64-bit) key and the widened
32-hex (full md5) setting a true 100 TB corpus needs must each produce
identical rows on Spark and DuckDB — the width is one shared constant
(`EVAL_OVERLAP_KEY_HEX`), and this test pins that the parameterization
itself cannot drift between the engines."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    cols = [d[0] for d in
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0").description]
    return cols, sorted(con.execute(sql).fetchall())


@pytest.mark.parametrize("kh", [16, 32])
def test_eval_overlap_parity_both_widths(spark, kh):
    sdf = entrymod.q_text_eval_overlap(spark, SF, key_hex_chars=kh)
    scols = sdf.columns
    srows = sorted(tuple(r) for r in sdf.collect())
    from lswms_forage_etl_spark import lifecycle
    lifecycle.release_tracked()
    spark.catalog.clearCache()
    ocols, orows = _oracle_rows(entrymod._eval_overlap_sql(kh))
    assert ocols == scols
    assert srows == [tuple(r) for r in orows]
    assert srows, "expected at least one flagged train doc at sf0.001"


def test_registered_oracle_uses_the_shared_constant():
    assert entrymod.oracle_sql()["text_eval_overlap"] == \
        entrymod._eval_overlap_sql(entrymod.EVAL_OVERLAP_KEY_HEX)
