#!/usr/bin/env python3
"""Deterministic ~KX amplification of an sf test directory (VERDICT r9
task 7: scale-stress the stop-band caps and skew guards on a corpus
10x the bench SF, locally).

Usage: python3 tools/make_scale.py SRC_DIR DST_DIR [K]

Amplification is exact replication with FRESH ids: rep r of K maps
every id to id*K + r, applied consistently to both sides of every
join key, so

- per-key join fanout is PRESERVED (each amplified orderkey carries
  the ORIGINAL lineitem fanout -> join output grows Kx, not K^2x;
  the hot-key skew shape survives as K distinct hot keys per
  original hot key);
- duplicate/clone groups grow Kx (texts/embeddings replicated
  verbatim under fresh ids -- a Kx crawl has Kx duplication), which
  is exactly what must push the stop-band caps (200 minhash / 800
  sig buckets) into engaging LOUDLY (the StopBand audit) instead of
  quadratic pair work;
- everything is deterministic: no RNG, byte-identical reruns.

Only the tables the dedup/ANN/skew subset reads are amplified
(documents, embeddings, lineitem, orders, events); dimension tables
copy through unchanged.
"""
import shutil
import sys

import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT UNNEST(range({k})) AS r)"

    def amplify(table, id_exprs, keep="*"):
        cols = ", ".join(id_exprs) + (f", {keep}" if keep else "")
        con.execute(
            f"COPY (SELECT {cols} FROM '{src}/{table}.parquet', {reps}) "
            f"TO '{dst}/{table}.parquet' (FORMAT parquet)")

    amplify("documents", [f"doc_id * {k} + r AS doc_id"],
            "COLUMNS(c -> c NOT IN ('doc_id', 'r'))")
    amplify("embeddings", [f"vec_id * {k} + r AS vec_id"],
            "COLUMNS(c -> c NOT IN ('vec_id', 'r'))")
    amplify("events", [f"event_id * {k} + r AS event_id",
                       f"user_id * {k} + r AS user_id"],
            "COLUMNS(c -> c NOT IN ('event_id', 'user_id', 'r'))")
    # join keys map consistently on BOTH sides; row-identity keys get
    # fresh values too so uniqueness invariants survive
    amplify("lineitem", [f"l_orderkey * {k} + r AS l_orderkey"],
            "COLUMNS(c -> c NOT IN ('l_orderkey', 'r'))")
    amplify("orders", [f"o_orderkey * {k} + r AS o_orderkey"],
            "COLUMNS(c -> c NOT IN ('o_orderkey', 'r'))")
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    for t in ("documents", "embeddings", "events", "lineitem", "orders"):
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
