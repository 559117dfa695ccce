"""Sources & sinks: format readers and partitioned writers."""

from gluettalax_spark.sources.io import (  # noqa: F401
    read_table,
    write_partitioned,
    write_table,
)
