"""Driver-contract smoke: every queries() entry runs at sf0.001 and has an
oracle; entry() returns rows. (Full value-hash checks run via
tools/driver_sim.py against DuckDB at sf0.01 — this test guards imports,
schemas, and executability inside the normal pytest gate.)"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert len(df.collect()) > 0


# Queries DELIBERATELY without a SQL twin (driver records rows-only):
# iterative distributed algorithms with no single-SQL equivalent. Anything
# else missing an oracle is a bug.
ROWS_ONLY = {"ann_ivf_trained_topk"}


def test_every_query_has_oracle_and_runs(spark):
    qs, oracles = E.queries(), E.oracle_sql()
    missing = [k for k in qs if k not in oracles and k not in ROWS_ONLY]
    assert not missing, f"queries without oracle twins: {missing}"
    assert not (set(oracles) - set(qs)), "orphan oracles"
    for name, fn in qs.items():
        df = fn(spark, SF)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_oracles_are_valid_duckdb():
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        res = con.execute(sql)
        assert res.description, name
