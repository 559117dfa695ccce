"""gluettalax_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of andreax79/GLUEttalax
(reference: /root/reference/gluettalax.py) on top of Apache Spark:

* **Control plane** (the reference's own surface): catalog + partition DDL
  + crawler/job orchestration, re-expressed over ``spark.catalog`` and a
  local job runner (see :mod:`gluettalax_spark.plans` and
  :mod:`gluettalax_spark.jobs`).
* **Data plane** (what the reference delegates to AWS Glue jobs, which are
  managed Spark jobs): a library of named relational / text / similarity
  operators over Spark DataFrames (see :mod:`gluettalax_spark.operators`).

Everything is public PySpark API; the planner work (pushdown, pruning,
join selection, AQE) is deliberately left to Catalyst.
"""

__version__ = "0.1.0"

from gluettalax_spark.session import get_spark  # noqa: F401
