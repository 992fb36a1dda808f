#!/usr/bin/env python
"""Deterministic structural probe: #Spark jobs + #stages + total tasks per
query execution (steal-immune evidence for before/after comparisons)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from nano_vectordb_rs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def main():
    names = sys.argv[1:]
    spark = get_spark("job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    # warm
    queries["knn_topk"](spark, SF_DIR).collect()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        q = queries[name]
        q(spark, SF_DIR).collect()  # warm this query's path
        before = set(tracker.getJobIdsForGroup(None) or [])
        # also read allJobs via listener-free approach: use jobIds global
        jb = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
        before_all = set(list(jb))
        t0 = time.perf_counter()
        q(spark, SF_DIR).collect()
        wall = time.perf_counter() - t0
        ja = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
        after_all = set(list(ja))
        new_jobs = sorted(after_all - before_all)
        st = spark.sparkContext._jsc.sc().statusTracker()
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            info = st.getJobInfo(j)
            if info.isDefined():
                sids = list(info.get().stageIds())
                for s in sids:
                    si = st.getStageInfo(s)
                    if si.isDefined():
                        n_stages += 1
                        n_tasks += si.get().numTasks()
        out[name] = {"jobs": len(new_jobs), "stages": n_stages,
                     "tasks": n_tasks, "wall": round(wall, 3)}
        print(name, out[name], flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
