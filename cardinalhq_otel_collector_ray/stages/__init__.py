from . import (  # noqa: F401
    aggregate,
    dedup,
    enrich,
    multimodal,
    parse,
    route,
    sample,
    similarity,
    summarysplit,
    temporal,
    textstats,
    transform,
)
