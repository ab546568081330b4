"""The declared query inventory (SURVEY.md §2 Part B).

Importing this package registers every query with
``project_map_reduce_spark.registry``. One module per inventory family.

Import order IS registration order, and the correctness driver checks the
first 50 registrations per round. Modules are therefore ordered so queries
that most need a fresh driver signal register first (previously unchecked
windows/udfs/text ops, then families that had environmental failures),
while the long-stable trivial families (scans, filters, sort/topk, setops)
take the back of the queue.
"""

from project_map_reduce_spark.plans import (  # noqa: F401
    windows,  # Q22-Q25: never driver-checked in r1 (50-cap)
    udfs,  # Q49, Q50, Q59: never driver-checked in r1
    text_analysis,  # Q46-47, Q55-58, Q61: 4 of 7 never checked
    streaming_shaped,  # Q39-Q42: failed on events conf, now fixed
    agg_extra,  # Q16-Q21: 3 failed on events conf
    joins,  # Q06-Q14 + Q74 range join: asof failed on events conf in r1
    scalars,  # Q33-Q38, Q60: json_extract failed on events conf
    dedup,  # Q43-44, Q51-53: fuzzy had no oracle, now has one
    similarity,  # Q45, Q54: ann had no oracle, now has one
    aggregates,  # Q15 flagship
    scans,  # Q01-Q02: stable green
    filters,  # Q03-Q05, Q48: stable green
    sort_topk,  # Q26-Q28: stable green
    setops,  # Q29-Q32: stable green
    sampling,  # Q62-Q63: round-2 additions, driver-unchecked (past the 50-cap)
    olap_extra,  # Q64-Q66: pivot/percentiles/corr, also past the 50-cap
    pipeline_guard,  # Q68-Q70: decontam/PII/repetition, also past the 50-cap
    event_analytics,  # Q72-Q73: retention/funnel, also past the 50-cap
)
