"""Incremental / streaming operators: the bronze→silver hop as a
Structured Streaming file source with checkpointed exactly-once-per-file
semantics, plus stateful operators (sessionization)."""
