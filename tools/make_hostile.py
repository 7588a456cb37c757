#!/usr/bin/env python3
"""Build an adversarial copy of a testdata SF dir: same tables, plus
planted hostile document rows (NULL text, empty string, whitespace-only,
multi-byte CJK, very short). Running the normal gate against it proves
the operators AND their DuckDB oracles agree on misbehaving corpora,
not just the clean synthetic data.

Usage:
    python3 tools/make_hostile.py [srcSfDir] [destDir]
    sbt 'runMain graft.Verify <destDir> /tmp/v_hostile'
    python3 tools/check_oracle.py <destDir> /tmp/v_hostile
"""
import shutil, sys

import duckdb

HOSTILE = [
    (90001, None, "en", "hostile", 0),
    (90002, "", "en", "hostile", 0),
    (90003, "   ", "de", "hostile", 3),
    (90004, "机器学习模型需要 大量 高质量 的 训练数据", "zh", "hostile", 22),
    (90005, "short", "en", "hostile", 5),
    # NULL source/lang: crawl metadata is often missing. Engine
    # when/otherwise vs oracle CASE must agree on where these land
    # (p15's round-12 NULL-source bug is the class this row catches).
    (90006, "metadata free text with several plain tokens", None, None, 44),
    # NULL doc_id (round 14): a keyless row. Key-driven routing must
    # land it in exactly ONE place, never silently drop it from both
    # legs (the k26 generation-routing class the r13 advice flagged);
    # joins/dedup on the key must exclude it exactly like the
    # oracle's SQL three-valued logic does.
    (None, "a row that arrived without its key but still counts", "en",
     "hostile", 46),
]

# Zero vectors = failed/padding embeddings. 19950 is divisible by the
# ANN queryStride (50) AND below the r18 query cap (50 · AnnMaxQueries
# = 20000), so it still exercises a zero-norm QUERY vector under the
# capped stride (90050 would silently fall outside the query set and
# turn the scenario vacuous).
HOSTILE_EMB = [
    (19950, [0.0] * 64, 0),
    (19951, [0.0] * 64, 1),
]

# (event_id, ts literal or None, user_id, event_type, value)
# null ts / null user_id must be DROPPED by loader+oracle alike;
# null event_type groups as a null key; null value is skipped by sums.
# 91003/91004 share one session for a fresh user so the null-value
# session still has a non-null sum (streaming coalesces to 0).
HOSTILE_EVT = [
    (91001, None, 7, "click", 1.5),
    (91002, "2024-03-01 00:00:00", None, "click", 2.5),
    (91003, "2024-03-01 00:10:00", 700001, None, 3.5),
    (91004, "2024-03-01 00:20:00", 700001, "click", None),
]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_hostile"
    shutil.rmtree(dest, ignore_errors=True)
    shutil.copytree(src, dest)
    con = duckdb.connect()
    def s_or_null(v):
        return "NULL" if v is None else "'%s'" % v
    rows = ", ".join(
        "(%s, %s, %s, %s, %d)"
        % ("NULL::BIGINT" if d is None else str(d),
           s_or_null(t), s_or_null(l), s_or_null(s), n)
        for d, t, l, s, n in HOSTILE)
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{dest}/documents.parquet')
          UNION ALL
          SELECT * FROM (VALUES {rows})
            AS t(doc_id, text, lang, source, n_chars)
        ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
    """)
    emb_rows = ", ".join(
        "(%d, %s::FLOAT[], %d)" % (v, e, l) for v, e, l in HOSTILE_EMB)
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{dest}/embeddings.parquet')
          UNION ALL
          SELECT * FROM (VALUES {emb_rows})
            AS t(vec_id, embedding, label)
        ) TO '{dest}/embeddings.parquet' (FORMAT PARQUET)
    """)
    evt_rows = ", ".join(
        "(%d, %s, %s, %s, %s, NULL)" % (
            e,
            "NULL" if ts is None else f"TIMESTAMP '{ts}'",
            "NULL" if u is None else str(u),
            "NULL" if t is None else f"'{t}'",
            "NULL" if v is None else str(v))
        for e, ts, u, t, v in HOSTILE_EVT)
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{dest}/events.parquet')
          UNION ALL
          SELECT * FROM (VALUES {evt_rows})
            AS t(event_id, ts, user_id, event_type, value, props)
        ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    total, nonnull = con.execute(
        f"SELECT count(*), count(text) "
        f"FROM read_parquet('{dest}/documents.parquet')").fetchone()
    nemb = con.execute(
        f"SELECT count(*) "
        f"FROM read_parquet('{dest}/embeddings.parquet')").fetchone()[0]
    nevt, nts = con.execute(
        f"SELECT count(*), count(ts) "
        f"FROM read_parquet('{dest}/events.parquet')").fetchone()
    print(f"{dest}: {total} docs ({total - nonnull} null-text), "
          f"{nemb} embeddings (incl. zero vectors), "
          f"{nevt} events ({nevt - nts} null-ts)")


if __name__ == "__main__":
    main()
