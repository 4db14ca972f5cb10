"""Driver-contract consistency checks (cheap; full oracle comparison runs in
tools/check_correctness.py and in the driver itself)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries())
    osql = entry.oracle_sql()
    assert set(osql) <= qs
    missing = qs - set(osql)
    # only hash/codec-based ops may lack an oracle
    assert missing <= {
        "text_fingerprint", "dedup_minhash_lsh", "dedup_simhash",
        "media_decode_stub", "ann_lsh_topk", "ann_ivf_topk",
    }


def test_oracle_sql_is_runnable_duckdb(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in entry.oracle_sql().items():
        n = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        assert n >= 0, name
