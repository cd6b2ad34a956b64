"""SimHash banded join = brute-force Hamming search, exactly.

The banding claim (any pair at Hamming ≤ k shares a band when k < bands,
so the band-equality join loses nothing) is verified literally: compute
every sketch, enumerate ALL pairs at distance ≤ k by brute force, and
assert the banded query returns exactly that set — at the default 64-bit
sketch and at the 4×32-bit sizing documented for 10^9-doc corpora.
DuckDB executes (fast, no Spark); Spark↔DuckDB equivalence of the same
SQL builder is covered by the driver gate (dedup_simhash_neardup).
"""

import duckdb
import pytest

from slog_agent_spark.functions.dialect import DUCKDB
from slog_agent_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return c


@pytest.mark.parametrize("bands,band_bits", [(4, 16), (4, 32)])
def test_banded_equals_bruteforce(con, bands, band_bits):
    k = 3
    items = dedup.simhash_band_items(DUCKDB, bands=bands, band_bits=band_bits)
    sel = ", ".join(f"{e} AS {name}" for name, e in items.items())
    sketches = con.execute(
        f"WITH sets AS (SELECT doc_id, {dedup.shingles_expr(DUCKDB)} AS sharr"
        f" FROM documents) SELECT doc_id, {sel} FROM sets"
    ).fetchall()
    brute = set()
    for i in range(len(sketches)):
        for j in range(i + 1, len(sketches)):
            a, b = sketches[i], sketches[j]
            dist = sum(
                bin(a[c] ^ b[c]).count("1") for c in range(1, bands + 1)
            )
            if dist <= k:
                pair = (min(a[0], b[0]), max(a[0], b[0]))
                brute.add(pair)
    banded = {
        (r[0], r[1])
        for r in con.execute(
            dedup.simhash_neardup_pairs_sql(
                DUCKDB, k=k, bands=bands, band_bits=band_bits
            )
        ).fetchall()
    }
    assert banded == brute
    assert brute, "fixture should contain near-duplicates"
