# Prototype parity check (driver-side validation, like tools/check.py):
# does DuckDB reproduce graft's lshBucket sign-bit assignment exactly?
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark_csv = sys.argv[2]  # csv dumped by graft.tools.DumpLshBuckets: vec_id,bucket

con = duckdb.connect()
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM parquet_scan('{sf}/embeddings.parquet')")
duck = dict(con.execute("""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings)
SELECT vec_id,
  array_to_string(list_transform(range(0,8), j ->
    CASE WHEN list_sum(list_transform(range(0,64), i ->
      e[i+1] * (strpos('0123456789abcdef',
                       substr(md5(j::VARCHAR || ':' || i::VARCHAR), 1, 1)) - 8.5)
    )) >= 0 THEN '1' ELSE '0' END), '') AS bucket
FROM v ORDER BY vec_id
""").fetchall())

spark = {}
with open(spark_csv) as f:
    for line in f:
        line = line.strip()
        if not line or line.startswith("vec_id"):
            continue
        k, v = line.split(",")
        spark[int(k)] = v

mismatch = [k for k in duck if duck[k] != spark.get(k)]
print(f"{len(duck)} vectors; {len(mismatch)} bucket mismatches")
for k in mismatch[:10]:
    print(f"  vec {k}: duck={duck[k]} spark={spark.get(k)}")
sys.exit(1 if mismatch else 0)
