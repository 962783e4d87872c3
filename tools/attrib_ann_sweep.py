"""VERDICT r14 #3 attribution experiment: does ann_ivf_recall_sweep lose a
shared stage when the r14 entries (ann_index_publish_probe, ann_routed_topk)
run between ann_ivf_topk and the sweep?

Mode A = r14 registry order (with the two new entries)
Mode B = r13 order (without them)
Both: fresh session, run each query with the bench noop sink, record wall
time and which session stages were BUILT during that query (delta of the
stage-memo key set). Run each mode in its own process:

    python tools/attrib_ann_sweep.py A
    python tools/attrib_ann_sweep.py B

r15 finding (COVERAGE "VERDICT r14 #3"): the sweep builds NO stage in
either order and was FASTER with the r14 neighbors present (A: 2.99 s /
hot 1.26 s; B: 5.45 s / hot 3.59 s) -- the "lost stage sharing"
hypothesis is refuted; the r13->r14 in-suite delta was host class.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqldataintegrationfunctiontriggerapp_spark.session import get_session
from sqldataintegrationfunctiontriggerapp_spark.plans import _util
from sqldataintegrationfunctiontriggerapp_spark import plans

mode = sys.argv[1]
sf_dir = "/root/testdata/sf0.1"
ORDER_A = [
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_blas_topk",
    "ann_ivf_standing_topk", "ann_index_publish_probe", "ann_routed_topk",
    "embedding_norms", "embedding_centroids", "ann_ivf_recall_sweep",
]
ORDER_B = [
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_blas_topk",
    "ann_ivf_standing_topk",
    "embedding_norms", "embedding_centroids", "ann_ivf_recall_sweep",
]
order = ORDER_A if mode == "A" else ORDER_B

spark = get_session(app_name=f"sweep_attrib_{mode}")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for name in order:
    before = set(k[2] for k in _util._STAGE_CACHE)
    t0 = time.time()
    plans.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    built = sorted(set(k[2] for k in _util._STAGE_CACHE) - before)
    spark.catalog.clearCache()
    _util.stage_ledger_tick(spark)
    print(f"RESULT {mode} {name}: {dt:.2f}s built={built}", flush=True)
# hot repeat of the sweep: isolates per-call recompute cost with every
# stage resident
t0 = time.time()
plans.QUERIES["ann_ivf_recall_sweep"](spark, sf_dir).write.mode(
    "overwrite").format("noop").save()
print(f"RESULT {mode} sweep_hot_repeat: {time.time() - t0:.2f}s", flush=True)
