from __future__ import annotations

from outrank_spark.streaming.sketch_stream import StreamingSketchAccumulator
from outrank_spark.streaming.sliding_stream import StreamingSlidingDistinct

__all__ = ["StreamingSketchAccumulator", "StreamingSlidingDistinct"]
