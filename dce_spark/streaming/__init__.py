"""Structured Streaming extension (no counterpart in the reference).

The reference validates finite tables only (SURVEY §2.9); its SLA block
is declared but never evaluated. This package enforces contracts on
*streams*: per-microbatch validation via foreachBatch running the same
fused check compiler, plus watermarked windowed quality aggregations
for continuous monitoring.
"""

from .enforce import streaming_quality_aggregates, validate_stream

__all__ = ["validate_stream", "streaming_quality_aggregates"]
