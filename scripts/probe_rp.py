"""Probe: where does embedding_rp_project / ann_rp_rerank time go —
planning (analysis/optimization of the giant RP expression tree) or
execution?  Times df construction, explain (forces analysis+optimization),
and the noop write separately."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_util_spark.core.session import get_spark
from cassandra_util_spark.entry_queries import QUERIES

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe-rp")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()  # warm

for name in ["embedding_rp_project", "ann_rp_rerank"]:
    for rep in range(2):
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.monotonic()
        df._jdf.queryExecution().executedPlan()  # force analysis+optimization+planning
        t2 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()
        print(f"{name} rep{rep}: build={t1-t0:.2f}s plan={t2-t1:.2f}s exec={t3-t2:.2f}s total={t3-t0:.2f}s", flush=True)
