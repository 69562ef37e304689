"""Job lifecycle templates (reference import_job.rb / dedup_job.rb).

Template method: subclass, override `job(gateway)`; cleanup is
guaranteed (import_job.rb:16-23, dedup_job.rb:13-20).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from voter_gateway_spark.session import GatewaySession


class Job:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def job(self, gateway: GatewaySession):
        raise NotImplementedError

    def perform(self):
        gateway = GatewaySession(self.spark)
        try:
            return self.job(gateway)
        finally:
            gateway.clean_up()


class ImportJob(Job):
    """CSV → stage → match → upsert (import_job.rb)."""


class DedupJob(Job):
    """Self-dedup with invariant gate (dedup_job.rb)."""
