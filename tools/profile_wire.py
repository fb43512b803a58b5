"""Ad-hoc profiling of the wire_browser_roundtrip stages."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from divolte_collector_spark.session import get_spark, load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark("profile")
spark.sparkContext.setLogLevel("ERROR")


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:40s} {time.time()-t0:7.2f}s")


from divolte_collector_spark.queries.wire_parity import q_wire_roundtrip
from divolte_collector_spark.queries import all_queries

# Stage 1: encode only (reuse internals by rebuilding the requests DF)
from divolte_collector_spark.functions.base36 import base36_encode
from divolte_collector_spark.functions.checksum import murmur3_32_signed_udf

ev = load_table(spark, SF, "events")
ms = F.unix_millis(F.col("ts"))
b36ms = base36_encode(ms)
k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
p = F.concat(F.lit("0:"), b36ms, F.lit(":u"), F.col("user_id"))
canon = F.concat(F.lit("c="), b36ms, F.lit(",;"), F.lit("p="), p, F.lit(",;"))
t("encode: canon only", ev.select(canon.alias("c")))
t("encode: murmur over canon", ev.select(murmur3_32_signed_udf(canon).alias("x")))

# Full requests DF from the real query up to the decode boundary
import divolte_collector_spark.queries.wire_parity as wp

full = q_wire_roundtrip(spark, SF)
t("full roundtrip", full)

# Decode-only: materialize requests to parquet, then decode
from divolte_collector_spark.sources.browser import parse_browser_events

# rebuild requests exactly as in the query by monkey-patching decode to identity
reqs_holder = {}
orig = wp.parse_browser_events


def capture(requests, **kw):
    reqs_holder["df"] = requests
    return orig(requests, **kw)


wp.parse_browser_events = capture
_ = q_wire_roundtrip(spark, SF)
wp.parse_browser_events = orig
reqs = reqs_holder["df"]
t("requests (encode+repartition)", reqs)

reqs.write.mode("overwrite").parquet("/tmp/wire_reqs.parquet")
mat = spark.read.parquet("/tmp/wire_reqs.parquet")
t("decode from materialized parquet", parse_browser_events(mat))

dec = parse_browser_events(mat)
t("decode again (warm)", dec)

# decode without checksum udf
from divolte_collector_spark.sources import browser as B

print("\nexplain of decode:")
parse_browser_events(mat).explain("formatted")
