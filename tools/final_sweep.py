"""One matched-session measurement for the BASELINE.md duplicate-axis
"final sweep" table: run ONE operator at ONE sf_dir in a fresh process
(so the in-process quantizer fit caches are cold and the fit cost is
included, same protocol as the r4/r5 rows) and print the wall time.

Usage: python tools/final_sweep.py DIR {knn_graph|dedup_semantic}
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir, key = sys.argv[1], sys.argv[2]

from elastik_nearest_neighbors_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"final-sweep-{key}")
spark.sparkContext.setLogLevel("ERROR")

from elastik_nearest_neighbors_spark.operators import ivf  # noqa: E402

fn = {"knn_graph": ivf.knn_graph, "dedup_semantic": ivf.dedup_semantic}[key]
t = time.time()
n = fn(spark, sf_dir).count()
print(f"{key} @ {sf_dir}: {n} rows, {time.time() - t:.1f}s", flush=True)
