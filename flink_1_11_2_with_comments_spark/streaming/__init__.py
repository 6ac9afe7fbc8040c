"""Streaming layer — SURVEY §2.9.

Maps the reference's streaming machinery onto Structured Streaming:

- event time & watermarks → withWatermark (bounded out-of-orderness,
  the only strategy Spark supports; punctuated/per-partition-idle
  strategies are documented gaps)
- TUMBLE/HOP/SESSION group windows → window()/session_window()
- interval join → stream-stream join with time-range condition
- deduplicate → dropDuplicates[WithinWatermark]
- custom stateful (TopN, count windows, keyed process, CEP, as-of)
  → applyInPandasWithState (streaming/state.py and friends)

Exactly-once: Structured Streaming checkpointing + idempotent sinks
replaces the reference's aligned checkpoint barriers + 2PC sinks
(CheckpointCoordinator.java:92, TwoPhaseCommitSinkFunction.java) —
same guarantee, different mechanism; we never rebuild it.
"""

from .windows import hop, session, tumble  # noqa: F401
from .joins import interval_join  # noqa: F401
from .dedup import deduplicate  # noqa: F401
