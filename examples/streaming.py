"""Structured Streaming walkthrough: event stream -> windowed aggregates,
stream-stream interval join, and streaming into the FeatureStore layout.

Run: python examples/streaming.py  (uses /root/testdata/sf0.001/events.parquet)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil

from pyspark.sql import functions as F

from qafs_spark.session import get_spark
from qafs_spark.streaming import read_event_stream
from qafs_spark.streaming.ingest import interval_join_stream, save_stream, tumbling_agg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="qafs-spark-streaming-example")
src = tempfile.mkdtemp(prefix="stream_src_")
# file-source streams need a directory they can watch; stage a copy with
# the nanosecond timestamps truncated to Spark's microsecond type (the
# same normalization the batch query catalog applies on read)
from qafs_spark.queries import _t

_t(spark, SF_DIR, "events").write.mode("overwrite").parquet(src)

# 1. tumbling-window aggregation with a watermark
ev = read_event_stream(spark, src)
agg = tumbling_agg(ev, window="6 hours", watermark="1 hour")
q = (
    agg.writeStream.format("memory").queryName("ex_tumbling")
    .outputMode("append").trigger(availableNow=True).start()
)
q.awaitTermination(120)
spark.sql(
    "SELECT * FROM ex_tumbling ORDER BY window_start LIMIT 5"
).show(truncate=False)

# 2. stream-stream interval join: clicks within 2h after each purchase
ev2 = read_event_stream(spark, src)
clicks = ev2.filter(F.col("event_type") == "click").select("event_id", "ts", "user_id")
buys = ev2.filter(F.col("event_type") == "purchase").select(
    F.col("event_id").alias("p_id"), "ts", "user_id"
)
joined = interval_join_stream(clicks, buys, gap="2 hours", watermark="1 hour")
q2 = (
    joined.select(F.col("l.event_id").alias("click_id"), F.col("r.p_id").alias("purchase_id"))
    .writeStream.format("memory").queryName("ex_ssj")
    .outputMode("append").trigger(availableNow=True).start()
)
q2.awaitTermination(120)
print("joined pairs:", spark.sql("SELECT count(*) AS n FROM ex_ssj").first().n)

# 3. stream straight into the feature-dataset layout (readable by the store)
out = tempfile.mkdtemp(prefix="stream_feature_")
feature = ev.select(
    F.date_trunc("hour", "ts").alias("time"),
    F.col("ts").alias("created_time"),
    F.col("value"),
)
q3 = save_stream(feature, path=f"{out}/data", checkpoint=f"{out}/ckpt")
q3.awaitTermination(120)
print("streamed rows on disk:", spark.read.parquet(f"{out}/data").count())

shutil.rmtree(src, ignore_errors=True)
shutil.rmtree(out, ignore_errors=True)
spark.stop()
