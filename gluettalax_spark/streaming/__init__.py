"""Streaming surface: batch-mode window operators (oracle-checkable) and
their Structured Streaming twins (readStream + watermark, smoke-tested).
"""

from gluettalax_spark.streaming import joins, stateful, windows  # noqa: F401
