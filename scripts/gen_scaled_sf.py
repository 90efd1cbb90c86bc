"""Generate a K-times scaled copy of an sf dir for MEASUREMENT ONLY
(bench.py reads $SPARK_GRAFT_SF_DIR; the driver generates its own larger
SFs — this reproduces that volume locally so optimizations are validated
at the scale the driver times, per the optimization guide §1.1).

Layout fidelity: one parquet file per table with ONE row group (the
deterministic test tables are single-row-group files, i.e. one Spark scan
split — the exact layout the `_spread` input guard exists for).

Content fidelity vs naive duplication: keys are offset per copy (group
cardinalities scale instead of group sizes), document words carry a
per-copy suffix (shingle/minhash spaces stay disjoint across copies, so
near-dup pair structure scales linearly instead of quadratically), and
embeddings get a small deterministic per-copy perturbation (no phantom
exact-duplicate vectors).

Usage: python scripts/gen_scaled_sf.py <out_dir> [K] [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy_union(table: str, select_for_copy):
        parts = [select_for_copy(i) for i in range(k)]
        q = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({q}) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 100000000)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # tiny dims: straight copies (same content at any sf)
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 100000000)"
        )

    sizes = {
        t: con.sql(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        for t in ("customer", "documents", "embeddings", "events", "lineitem",
                  "orders", "part", "supplier")
    }
    n_users = con.sql(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]

    copy_union("customer", lambda i: f"""
        SELECT c_custkey + {i * sizes['customer']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'""")
    copy_union("supplier", lambda i: f"""
        SELECT s_suppkey + {i * sizes['supplier']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet'""")
    copy_union("part", lambda i: f"""
        SELECT p_partkey + {i * sizes['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet'""")
    copy_union("orders", lambda i: f"""
        SELECT o_orderkey + {i * sizes['orders']} AS o_orderkey,
               o_custkey + {i * sizes['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")
    copy_union("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * sizes['orders']} AS l_orderkey,
               l_partkey + {i * sizes['part']} AS l_partkey,
               l_suppkey + {i * sizes['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")
    copy_union("events", lambda i: f"""
        SELECT event_id + {i * sizes['events']} AS event_id, ts,
               user_id + {i * n_users} AS user_id, event_type, value, props
        FROM '{src}/events.parquet'""")
    # copy 0 verbatim; later copies suffix every word so shingle/minhash
    # spaces are disjoint across copies (near-dup structure scales
    # linearly, as fresh generated data would)
    word_suffix = "regexp_replace(text, '([a-z]+)', '\\1{i}', 'g')"
    copy_union("documents", lambda i: f"""
        SELECT doc_id + {i * sizes['documents']} AS doc_id,
               {"text" if i == 0 else word_suffix.format(i=i)} AS text,
               lang, source, n_chars
        FROM '{src}/documents.parquet'""")
    copy_union("embeddings", lambda i: f"""
        SELECT vec_id + {i * sizes['embeddings']} AS vec_id,
               {"embedding" if i == 0 else
                f"list_transform(embedding, x -> CAST(x + 0.003 * {i} * sin(x * 37.0) AS FLOAT))"}
                 AS embedding,
               label
        FROM '{src}/embeddings.parquet'""")


if __name__ == "__main__":
    main()
