"""Structured Streaming layer: stream assembly, sinks, stateful operators.

Every transform in ``operators/`` is stream-compatible by construction
(pure DataFrame functions); this package adds the pieces that only exist
in streaming — source/sink assembly, watermarks, state."""
