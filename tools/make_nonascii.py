#!/usr/bin/env python3
"""Build a non-ASCII-augmented copy of an sf test directory.

Usage: python3 tools/make_nonascii.py <sfDir> <outDir>

Copies every table parquet from <sfDir> into <outDir>, appending a
handful of non-ASCII documents (accents, CJK, emoji / non-BMP) to
documents.parquet with fresh doc_ids. Every oracle query must then
stay green on the augmented dir:

    sbt "runMain graft.Verify <outDir> /tmp/v_na"
    python3 tools/check.py <outDir> /tmp/v_na

This is the round-3 gate for code-point hash semantics (VERDICT r2 #8):
polyHash/simhash/ngrams are code-point-defined on both engines and the
multimodal oracles count UTF-8 bytes, so parity no longer depends on
an ASCII corpus.
"""
import os
import shutil
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# accents (2-byte UTF-8), CJK (3-byte), emoji (4-byte / non-BMP
# surrogate pairs in UTF-16), combining accent, and a near-duplicate
# pair so the dedup family sees non-ASCII candidates too
DOCS = [
    ("fr", "café résumé naïve déjà vu à côté de la fenêtre ouverte sur la mer bleue"),
    ("de", "über die Brücke näher zur Höhle wo die Bären größer sind als früher"),
    ("zh", "中文 文本 处理 系统 需要 正确 的 编码 语义 测试 覆盖"),
    ("en", "emoji stress test 😀 with rockets 🚀 and sparkles ✨ inside plain text"),
    ("en", "emoji stress test 😀 with rockets 🚀 and sparkles ✨ inside plain text ok"),
    ("es", "combinación de acentos y eñes en un pequeño párrafo de prueba español"),
]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            shutil.copy(src, f"{out_dir}/{t}.parquet")
    con = duckdb.connect()
    base = con.sql(f"SELECT max(doc_id) FROM read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    rows = ",\n".join(
        f"({base + 1 + i}, '{text}', '{lang}', 'nonascii', {len(text)})"
        for i, (lang, text) in enumerate(DOCS))
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
          UNION ALL
          SELECT * FROM (VALUES {rows}) v(doc_id, text, lang, source, n_chars)
        ) TO '{out_dir}/documents.parquet' (FORMAT parquet)
    """)
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out_dir}/documents.parquet')").fetchone()[0]
    print(f"wrote {out_dir}: documents={n} (+{len(DOCS)} non-ASCII)")


if __name__ == "__main__":
    main()
