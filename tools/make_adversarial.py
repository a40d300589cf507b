#!/usr/bin/env python3
"""Build an adversarially-hardened copy of an sf test directory.

Usage: python3 tools/make_adversarial.py <sfDir> <outDir> [--ns-jitter]

The driver's generator has changed data shape between rounds (µs vs
ns timestamps, NTZ vs UTC annotation); this variant moves the LOCAL
gate first (VERDICT r7 #9) by injecting the edge shapes the next
generator change could carry:

  - events rows with NULL user_id, NULL event_type, NULL value (the
    group-by-null / join-drop semantics must agree between engines);
  - two fresh users with IDENTICAL per-type event counts at identical
    timestamps (rank/ntile/gini tie-breaks must be deterministic);
  - with --ns-jitter: the events table re-encoded as
    TIMESTAMP(NANOS) with sub-µs jitter on every row (Spark's
    nanosAsLong div-1000 truncation vs DuckDB's TIMESTAMP_NS read).

Then the gate must stay green (or its divergences be understood):

    sbt "runMain graft.Verify <outDir> /tmp/v_adv"
    python3 tools/check.py <outDir> /tmp/v_adv
"""
import os
import shutil
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ns_jitter = "--ns-jitter" in sys.argv
    sf_dir, out_dir = args[0], args[1]
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "events" and os.path.exists(src):
            shutil.copy(src, f"{out_dir}/{t}.parquet")
    con = duckdb.connect()
    # adversarial embeddings: a ZERO vector (no direction — its cosine
    # must be NULL in both engines, not NaN-vs-NULL divergence), an
    # exact duplicate of vector 0 (cosine exactly 1.0, tie-break paths),
    # and a 0.5-scalar multiple of vector 1 (near-1.0 cosine without
    # byte equality). High vec_ids so codebook/query seeds (low ids)
    # are untouched.
    emq = f"read_parquet('{sf_dir}/embeddings.parquet')"
    con.execute(f"""
        COPY (
          SELECT * FROM {emq}
          UNION ALL
          SELECT mx + 1, list_transform(range(0,64), i -> CAST(0.0 AS FLOAT)), 0
          FROM (SELECT max(vec_id) AS mx FROM {emq})
          UNION ALL
          SELECT mx + 2, (SELECT embedding FROM {emq} WHERE vec_id = 0), 1
          FROM (SELECT max(vec_id) AS mx FROM {emq})
          UNION ALL
          SELECT mx + 3,
            (SELECT list_transform(embedding, x -> CAST(x * 0.5 AS FLOAT))
             FROM {emq} WHERE vec_id = 1), 2
          FROM (SELECT max(vec_id) AS mx FROM {emq})
          ORDER BY vec_id
        ) TO '{out_dir}/embeddings.parquet' (FORMAT parquet)
    """)
    ev = f"read_parquet('{sf_dir}/events.parquet')"
    base_id, hi_user, max_ts = con.sql(
        f"SELECT max(event_id), max(user_id), max(ts) FROM {ev}").fetchone()
    # NULL-key rows: each combination of null user/type/value, with
    # valid timestamps inside the existing range so windows/sessions
    # see them; tied users: two fresh ids with identical (type, ts,
    # value) rows so every per-user count/rank ties exactly.
    inject = f"""
      SELECT {base_id} + 1 + row_number() OVER () AS event_id,
             ts, user_id, event_type, value, props
      FROM (
        SELECT * FROM (VALUES
          (TIMESTAMP '2024-01-01 01:00:00', NULL, 'click', 1.5, '{{"k": 1}}'),
          (TIMESTAMP '2024-01-01 02:00:00', NULL, 'view',  2.5, '{{"k": 2}}'),
          (TIMESTAMP '2024-01-01 03:00:00', CAST({hi_user} + 1 AS BIGINT), NULL, 3.5, '{{"k": 3}}'),
          (TIMESTAMP '2024-01-01 04:00:00', CAST({hi_user} + 2 AS BIGINT), NULL, 4.5, '{{"k": 4}}'),
          (TIMESTAMP '2024-01-01 05:00:00', NULL, NULL, NULL, NULL),
          (TIMESTAMP '2024-01-01 06:00:00', CAST({hi_user} + 3 AS BIGINT), 'click', NULL, '{{"k": 6}}')
        ) v(ts, user_id, event_type, value, props)
        UNION ALL
        SELECT TIMESTAMP '2024-01-01 12:00:00' + INTERVAL (m) MINUTE,
               CAST(u AS BIGINT), 'click', 7.0, '{{"k": 9}}'
        FROM (SELECT unnest([{hi_user} + 4, {hi_user} + 5]) AS u) uu,
             (SELECT unnest(range(5)) AS m) mm
      ) t
    """
    con.execute(f"""
        COPY (
          SELECT event_id, ts, user_id, event_type, value, props
          FROM (SELECT * FROM {ev} UNION ALL {inject})
          ORDER BY event_id
        ) TO '{out_dir}/events.parquet' (FORMAT parquet)
    """)
    # adversarial documents (r10, opt-in via --docs while the triaged
    # red list in SURVEY §5 burns down): NULL / empty / whitespace-only text
    # (tokenizer + quality-ratio division edges), NULL lang / NULL
    # source (per-language windows, URL-host derivation, mixture
    # group-bys), an exact duplicate of doc 0 under a fresh id (keeper
    # tie-breaks), and a fresh 2-doc exact-dup cluster. High doc_ids
    # so low-id codebook/query seeds are untouched — though mx+1 can
    # land on the bm25/recall sample grid (id % 50 == 0), which is the
    # point: a sampled query doc with degenerate text must behave
    # identically in both engines.
    dq = f"read_parquet('{sf_dir}/documents.parquet')"
    mx_doc, = con.sql(f"SELECT max(doc_id) FROM {dq}").fetchone()
    if "--docs" in sys.argv:
        con.execute(f"""
        COPY (
          SELECT * FROM (
            SELECT * FROM {dq}
            UNION ALL SELECT {mx_doc} + 1, NULL, 'es', 'src0', 0
            UNION ALL SELECT {mx_doc} + 2, '', 'en', 'src1', 0
            UNION ALL SELECT {mx_doc} + 3, '   ', 'en', 'src1', 3
            UNION ALL SELECT {mx_doc} + 4, text, lang, source, n_chars
                      FROM {dq} WHERE doc_id = 0
            UNION ALL SELECT {mx_doc} + 5, 'the', NULL, 'src2', 3
            UNION ALL SELECT {mx_doc} + 6, 'fast sort fast sort', 'fr', NULL, 19
            UNION ALL SELECT {mx_doc} + 7, 'fast sort fast sort', 'fr', 'src3', 19
          )
          ORDER BY doc_id
        ) TO '{out_dir}/documents.parquet' (FORMAT parquet)
    """)
    if ns_jitter:
        # re-encode as parquet TIMESTAMP(NANOS) with deterministic
        # sub-µs jitter (+(event_id*37) % 1000 ns): exercises Spark's
        # nanosAsLong div-1000 truncation vs DuckDB's TIMESTAMP_NS
        # read (duckdb 1.0 can't construct ns timestamps — pyarrow can)
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pq.read_table(f"{out_dir}/events.parquet")
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ns_arr = us * 1000 + (eid * 37) % 1000
        jittered = pa.array(ns_arr, type=pa.int64()).cast(pa.timestamp("ns"))
        t = t.set_column(t.schema.get_field_index("ts"), "ts", jittered)
        pq.write_table(t, f"{out_dir}/events.parquet",
                       coerce_timestamps=None, version="2.6")
    n, nn = con.sql(
        f"SELECT count(*), count(*) FILTER (WHERE user_id IS NULL OR event_type IS NULL) "
        f"FROM read_parquet('{out_dir}/events.parquet')").fetchone()
    print(f"wrote {out_dir}: events={n} ({nn} null-keyed, ns_jitter={ns_jitter})")


if __name__ == "__main__":
    main()