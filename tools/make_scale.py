#!/usr/bin/env python3
"""Deterministic ~KX amplification of an sf test directory (VERDICT r9
task 7: scale-stress the stop-band caps and skew guards on a corpus
10x the bench SF, locally).

Usage: python3 tools/make_scale.py SRC_DIR DST_DIR [K] [--jitter EPS]

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

--jitter EPS (diversity-preserving mode, VERDICT r10 follow-up):
verbatim embedding clones make the Kx RECALL measurement trivially
easy -- every query's true top-k are exact copies at cosine 1.0,
which all LSH tables bank together. With --jitter, rep 0 stays
verbatim and reps 1..K-1 get a DETERMINISTIC additive perturbation
e'_i = e_i + EPS * ||e||/sqrt(d) * u_i with u_i an arithmetic-hash
uniform in [-1, 1): the clone family spreads to cosine about
1/sqrt(1 + EPS^2/3) of its seed (EPS=1 -> ~0.87, EPS=2 -> ~0.65),
modelling a denser sample from the same distribution instead of a
duplicate blow-up. Still no RNG -- byte-identical reruns.
"""
import shutil
import sys

import duckdb


def main():
    args = list(sys.argv[1:])
    eps = None
    if "--jitter" in args:
        i = args.index("--jitter")
        eps = float(args[i + 1])
        del args[i:i + 2]
    src, dst = args[0], args[1]
    k = int(args[2]) if len(args) > 2 else 10
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
    if eps is None:
        amplify("embeddings", [f"vec_id * {k} + r AS vec_id"],
                "COLUMNS(c -> c NOT IN ('vec_id', 'r'))")
    else:
        # deterministic per-(vec_id, rep, element) uniform in [-1, 1).
        # NOT a linear congruence: a Lehmer-style (A*vec_id + B*i) mod p
        # is linear in both ids, so the noise of every vector shares one
        # ramp shape -- a corpus-wide common component that inflated
        # cross-family cosines (measured: 20% of ALL pairs above 0.35).
        # DuckDB's 64-bit hash() mixes properly.
        u = "(hash(vec_id, r, i) % 2000001) / 1000000.0 - 1.0"
        # pass-through columns selected dynamically (ADVICE r11): a
        # hardcoded (vec_id, embedding, label) list silently diverges
        # from the verbatim path if embeddings gains or loses a column
        con.execute(f"""
            COPY (
              WITH e AS (
                SELECT *,
                       sqrt(list_sum(list_transform(embedding, x -> x*x))) AS nrm,
                       len(embedding) AS d
                FROM '{src}/embeddings.parquet')
              SELECT vec_id * {k} + r AS vec_id,
                     CASE WHEN r = 0 OR nrm IS NULL OR nrm = 0 THEN embedding
                          ELSE [CAST(embedding[i] + {eps} * nrm / sqrt(d) * ({u})
                                     AS FLOAT)
                                FOR i IN range(1, d + 1)] END AS embedding,
                     COLUMNS(c -> c NOT IN ('vec_id', 'embedding', 'nrm', 'd', 'r'))
              FROM e, {reps}
            ) TO '{dst}/embeddings.parquet' (FORMAT parquet)""")
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
