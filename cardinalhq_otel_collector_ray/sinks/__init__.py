from .partitioned import PartitionedSink, partition_dir  # noqa: F401
