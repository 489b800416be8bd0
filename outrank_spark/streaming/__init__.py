from __future__ import annotations

from outrank_spark.streaming.sketch_stream import StreamingSketchAccumulator

__all__ = ["StreamingSketchAccumulator"]
