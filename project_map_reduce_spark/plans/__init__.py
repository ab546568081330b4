"""The declared query inventory (SURVEY.md §2 Part B).

Importing this package registers every query with
``project_map_reduce_spark.registry``. One module per inventory family.
"""

from project_map_reduce_spark.plans import (  # noqa: F401
    agg_extra,
    aggregates,
    dedup,
    filters,
    joins,
    scalars,
    scans,
    setops,
    similarity,
    sort_topk,
    streaming_shaped,
    text_analysis,
    udfs,
    windows,
)
