"""Phase profile of streaming_stateful_timeout_sessions (VERDICT r14
#3): split the 26.9 s isolated cost into (a) replay staging, (b) stream
start/stop fixed cost, (c) per-micro-batch trigger breakdown from
StreamingQueryProgress (addBatch = actual execution incl. the Python
worker; the rest is trigger machinery), so the A/B knobs target the
real residual.

    python tools/r15_sessionize_profile.py [--records-per-batch=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from walden_spark.session import get_spark
    from walden_spark.streaming.stateful import (
        _SESS_OUT,
        _SESS_STATE,
        _sessionize_user,
        _stage_replay_one_job,
    )
    from walden_spark.streaming.windows import scaled_state_partitions
    from walden_spark.tables import load_table
    from pyspark.sql.streaming.state import GroupStateTimeout

    sf_dir = "/root/testdata/sf0.1"
    mrpb = None
    for a in sys.argv[1:]:
        if a.startswith("--records-per-batch="):
            mrpb = a.split("=", 1)[1]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r15_sess_profile", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    if mrpb:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", mrpb)

    for rep in range(3):
        t0 = time.perf_counter()
        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
        stage = _stage_replay_one_job(spark, ev, "user_id", "walden_sessprof_")
        t_stage = time.perf_counter() - t0

        nparts = scaled_state_partitions(spark, stage)
        stream = (
            spark.readStream.schema("event_id long, user_id long, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(stage)
        )
        sessions = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_user,
                outputStructType=_SESS_OUT,
                stateStructType=_SESS_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        t1 = time.perf_counter()
        q = (
            sessions.writeStream.outputMode("update")
            .format("memory")
            .queryName(f"sessprof_{rep}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            progress = [json.loads(p.json) for p in q.recentProgress]
            q.stop()
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        t_stream = time.perf_counter() - t1
        n_rows = spark.table(f"sessprof_{rep}").count()

        total = time.perf_counter() - t0
        print(
            f"rep{rep}: total {total:6.2f}s  staging {t_stage:6.2f}s  "
            f"stream {t_stream:6.2f}s  state_parts {nparts}  out_rows {n_rows}"
        )
        keys = [
            "triggerExecution", "addBatch", "getBatch", "latestOffset",
            "queryPlanning", "walCommit", "commitOffsets",
        ]
        hdr = "  batch rows  " + "".join(f"{k[:14]:>15s}" for k in keys)
        print(hdr)
        for p in progress:
            dm = p.get("durationMs", {})
            print(
                f"  {p['batchId']:5d} {p.get('numInputRows', 0):5d}  "
                + "".join(f"{dm.get(k, 0)/1000.0:15.3f}" for k in keys)
            )
        sums = {
            k: sum(p.get("durationMs", {}).get(k, 0) for p in progress) / 1000.0
            for k in keys
        }
        ssum = " ".join(f"{k}={v:.2f}s" for k, v in sums.items())
        print(f"  SUM: {ssum}")
        # state operator metrics of the last batch with state
        for p in progress:
            for so in p.get("stateOperators", []):
                cp = {
                    k: so.get(k)
                    for k in (
                        "numRowsTotal", "numRowsUpdated", "allUpdatesTimeMs",
                        "commitTimeMs", "timeTakenToUpdateNumRows",
                    )
                    if k in so
                }
                print(f"  batch {p['batchId']} stateOp: {cp}")
    spark.stop()


if __name__ == "__main__":
    main()
