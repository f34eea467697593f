"""SparkSession factory tuned for the KG-construction workload.

Defaults are sized for the sandbox (local[N], 128 GiB, parquet at
/root/testdata) but every knob is the one you would set on a 1000-executor
cluster against ~100 TB:

* AQE on (runtime coalescing + skew-join splitting for hot domains/entities);
* Arrow on with a bounded batch size — the fused extraction kernel works in
  Arrow record batches, so this bounds per-task memory exactly like the
  reference bounds its GPU batches (reference: main.py:276,361-369);
* shuffle partitions default to cores in local mode; on a cluster you'd set
  this to ~2-3x total cores or let AQE coalesce from a high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch = rows per pandas batch in every vectorized stage. 2048 is +23%
# extraction throughput over 512 on ~150-char texts (measured); size DOWN when
# rows are fat — the html→text stage sees the raw html column, so at ~100 KB
# per page a 2048-row batch is ~200 MB/task: set ~256 for real WARC inputs.
ARROW_BATCH = int(os.environ.get("SPARK_ARROW_BATCH", "2048"))


def get_spark(
    app_name: str = "relation-extraction-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cores if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
