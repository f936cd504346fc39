"""Component-time profile of knn_graph at a given sf_dir: scan, assign,
assign+shuffle, full operator. Usage: python tools/profile_knn_graph.py DIR"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1]

from elastik_nearest_neighbors_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="knn-graph-profile")
spark.sparkContext.setLogLevel("ERROR")

from elastik_nearest_neighbors_spark.operators import ivf  # noqa: E402
from elastik_nearest_neighbors_spark.operators.graph import graph_model_for  # noqa: E402

t = time.time()
emb = ivf._emb(spark, sf_dir)
print("scan+count:", emb.count(), f"{time.time()-t:.1f}s", flush=True)

t = time.time()
graph_model_for(sf_dir)
print("model fit:", f"{time.time()-t:.1f}s", flush=True)

t = time.time()
mem = ivf._single_list_members(spark, sf_dir)
print("assign (no shuffle):", mem.count(), f"{time.time()-t:.1f}s", flush=True)

t = time.time()
print(
    "assign+shuffle (groupBy list count):",
    mem.groupBy("list_id").count().count(),
    f"{time.time()-t:.1f}s", flush=True,
)

t = time.time()
print("knn_graph rows:", ivf.knn_graph(spark, sf_dir).count(), f"{time.time()-t:.1f}s", flush=True)
