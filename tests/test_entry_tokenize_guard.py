"""tokenize_counts oracle-mirror guard: rows outside the modeled text class
(uppercase, or long enough to hit the MAX_TOKENS=203 cap) must collapse to
identical (-1,-1,-1) sentinels on BOTH the Spark and the DuckDB side, so a
future fixture change produces a loud sentinel row instead of a silent hash
mismatch (round-4 ADVICE, __spark_entry__.py SQL_TOKENIZE_COUNTS)."""

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def guard_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok_guard")
    long_text = " ".join(f"w{i}" for i in range(260))  # 261 tokens > 203 cap
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["hello world data", "Hello World", long_text, "spark table"],
        "lang": ["en", "en", "en", "en"],
        "source": ["t"] * 4,
        "n_chars": [16, 11, len(long_text), 11],
    }).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_sentinels_match_on_both_sides(spark, guard_sf_dir):
    import __spark_entry__ as E

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_hand"], r["n_oov"])
        for r in E.queries()["tokenize_counts"](spark, guard_sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{guard_sf_dir}/documents.parquet')")
    want = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
        for r in con.execute(E.SQL_TOKENIZE_COUNTS).fetchall()
    }
    # uppercase doc and over-cap doc → sentinels; valid docs → real counts
    assert got[2] == (-1, -1, -1)
    assert got[3] == (-1, -1, -1)
    assert got[1][0] > 0 and got[4][0] > 0
    assert got == want
