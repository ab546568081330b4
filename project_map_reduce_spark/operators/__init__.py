"""Engine operators that go beyond single Spark built-ins.

Each operator is a composition of declarative DataFrame ops first
(Catalyst-optimizable), with Arrow-batched pandas UDFs only where
built-ins genuinely can't express the semantics.
"""
