"""Dev drive: corpus gen + extract + tokenize through a real SparkSession,
diffed against the SQLite FTS5 oracle on the same rows."""
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from pdfsearch_spark.session import get_spark
from pdfsearch_spark import corpus
from pdfsearch_spark.oracle import FTS5Oracle
from pdfsearch_spark.fnv import fnv1_64_signed

N = 300
spark = get_spark("dev-drive", master="local[8]")

pages = corpus.web_pages_df(spark, N, partitions=8)

out_schema = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("tokens", ArrayType(StringType())),
])

def tok_batches(it):
    from pdfsearch_spark.extract import extract_text
    from pdfsearch_spark.analyzer import tokenize
    from pdfsearch_spark.fnv import fnv1_64_signed
    for pdf in it:
        texts = [extract_text(h) for h in pdf["html"]]
        yield pd.DataFrame({
            "doc_id": [fnv1_64_signed(u) for u in pdf["url"]],
            "url": pdf["url"],
            "tokens": [tokenize(t) for t in texts],
        })

res = pages.mapInPandas(tok_batches, schema=out_schema).collect()
print(f"spark rows: {len(res)}")

# oracle side: same rows driver-side
pdf = corpus.gen_pandas(N)
from pdfsearch_spark.extract import extract_text
pdf["text"] = [extract_text(h) for h in pdf["html"]]
ora = FTS5Oracle()
ora.load(pdf)

spark_tokens = {r["doc_id"]: sorted(r["tokens"]) for r in res}
bad = 0
for u, t in zip(pdf["url"], pdf["text"]):
    did = fnv1_64_signed(u)
    oracle_terms = sorted(ora.doc_terms(did))
    if spark_tokens.get(did) != oracle_terms:
        bad += 1
        if bad <= 3:
            mine = spark_tokens.get(did, [])
            om, mo = set(oracle_terms) - set(mine), set(mine) - set(oracle_terms)
            print("MISMATCH", u, "oracle-only:", sorted(om)[:10], "mine-only:", sorted(mo)[:10])
print(f"token-identity: {N - bad}/{N} docs match")
# determinism across partitionings
res2 = corpus.web_pages_df(spark, N, partitions=3).select("url", F.md5(F.col("html")).alias("h")).collect()
res1 = pages.select("url", F.md5(F.col("html")).alias("h")).collect()
assert sorted((r["url"], r["h"]) for r in res1) == sorted((r["url"], r["h"]) for r in res2), "partitioning changed content!"
print("determinism across partition counts: OK")
spark.stop()
