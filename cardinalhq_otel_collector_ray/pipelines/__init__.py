from .log_pipeline import (  # noqa: F401
    aggregate_by_source,
    build_enrichment_table,
    routed_documents,
    routed_from_docs,
    run_to_sinks,
    sink_counts,
)
