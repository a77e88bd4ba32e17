#!/usr/bin/env python3
"""Round-7 oracle prototyping: run each candidate DuckDB oracle at sf0.01,
print row count, dtypes, and head — before any Scala is written."""
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ["events", "orders", "documents", "customer"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

vote_sql = ",\n    ".join(f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(16))
sig_sql = " + ".join(f"(CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16))

ORACLES = {
    "q_asof_join": """
WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id, coalesce(p.ts_us - c.ts_us, -1) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
ORDER BY p.user_id, p.event_id""",

    "q_click_attribution": """
WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, count(c.ts_us) AS n_clicks
FROM p LEFT JOIN c ON c.user_id = p.user_id
  AND c.ts_us > p.ts_us - 3600000000 AND c.ts_us <= p.ts_us
GROUP BY 1, 2 ORDER BY 1""",

    "q_rolling_peak": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
r AS (SELECT user_id,
    count(*) OVER (PARTITION BY user_id ORDER BY ts_us
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS c1h
  FROM e)
SELECT user_id, CAST(max(c1h) AS BIGINT) AS peak_1h, count(*) AS n_events
FROM r GROUP BY user_id ORDER BY user_id""",

    "q_salted_agg": """
SELECT event_type, count(*) AS n,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1 ORDER BY 1""",

    "q_pivot_priority": """
SELECT o_orderstatus,
  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
FROM orders GROUP BY 1 ORDER BY 1""",

    "q_cube_docs": """
SELECT CAST(grouping(lang) * 2 + grouping(source) AS BIGINT) AS gid,
  coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY CUBE(lang, source)
ORDER BY gid, lang, source""",

    "q_simhash_pairs": f"""
WITH w AS (
  SELECT DISTINCT doc_id,
    unnest(list_distinct(string_split_regex(text, '\\s+'))) AS w
  FROM documents),
h AS (SELECT doc_id, CAST('0x' || substring(md5(w), 1, 4) AS INTEGER) AS h FROM w),
v AS (SELECT doc_id,
    {vote_sql}
  FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({sig_sql} AS BIGINT) AS simhash FROM v),
s AS (SELECT simhash, count(*) AS n_docs FROM sig GROUP BY simhash)
SELECT a.simhash AS sig_a, b.simhash AS sig_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
  a.n_docs * b.n_docs AS pair_docs
FROM s a JOIN s b ON a.simhash < b.simhash
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY sig_a, sig_b""",

    "q_streaming_hourly": """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",

    "q_salted_join": """
SELECT c_mktsegment, count(*) AS n,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1""",
}

for name, sql in ORACLES.items():
    try:
        df = con.sql(sql).df()
        print(f"== {name}: {len(df)} rows")
        print("  dtypes:", dict(df.dtypes.astype(str)))
        print(df.head(4).to_string(index=False))
    except Exception as e:
        print(f"== {name}: ERROR {e}")
