"""Structured Streaming surface (SURVEY §2.9 + §7 step 8).

The reference is a bounded streaming dataflow with backpressure and
checkpointed resume but no event-time semantics. Here the same operator
chains run on ``readStream`` sources with the full streaming feature set:
watermarks, tumbling/sliding/session windows, stateful dedup
(``dropDuplicatesWithinWatermark`` — the stateful analog of the dedup
backend D3), ``foreachBatch`` dual-write (rejected-rows sink), and
``maxFilesPerTrigger`` backpressure (the reference's ``max_in_flight``).
"""
