"""cardinalhq_otel_collector_ray — a Ray-Data-native data-processing engine.

A brand-new engine with the query/data-processing capabilities of the
cardinalhq/cardinalhq-otel-collector reference (parse → enrich → route →
aggregate telemetry pipelines), re-expressed Ray-Data-first:

- every per-record transform is a vectorized ``map_batches`` over zero-copy
  Arrow batches (``batch_format="pyarrow"``),
- stateful stages (broadcast enrichment dictionaries, compiled regex banks,
  template/fingerprint state) are actor pools,
- the interval groupby-aggregate (reference
  ``processor/aggregationprocessor/aggregate.go``) is a two-phase
  pre-combine + global ``groupby().aggregate()`` shuffle,
- sinks are partitioned Parquet directories with per-partition lineage
  manifests (the analog of the reference's S3 partitioned sink + webhook
  notifier, ``exporter/awss3exporter/``).

NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions are owned by the
driver, ``bench.py``, CLI entry points and the test fixture.
"""

__version__ = "0.1.0"
