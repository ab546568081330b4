"""The declared query inventory (SURVEY.md §2 Part B).

Importing this package registers every query with
``project_map_reduce_spark.registry``. One module per inventory family.
"""

from project_map_reduce_spark.plans import (  # noqa: F401
    aggregates,
    scans,
)
