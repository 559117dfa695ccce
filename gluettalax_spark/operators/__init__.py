"""Data-plane operator library.

Importing this package imports every operator module for its
``@register`` side effects — the registry in
:mod:`gluettalax_spark.registry` is the single source of truth the
driver contract (``__spark_entry__.py``) exposes.
"""

from gluettalax_spark.operators import (  # noqa: F401
    aggregates,
    ann,
    curation,
    dedup,
    graph,
    hypothesis,
    interval,
    joins,
    multimodal,
    pipeline,
    relational,
    reshape,
    runhistory,
    scalars,
    semantic,
    similarity,
    skew,
    stats,
    text,
    tpch,
    tpch_ext,
    tseries,
    tpch_ext2,
    tpch_ext3,
    windows,
)
from gluettalax_spark import streaming  # noqa: F401
