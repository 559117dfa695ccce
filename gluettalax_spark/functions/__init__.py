"""Scalar-function layer: glob translation, duration formatting, and the
string/date/math/JSON/array function surface exposed as queries in
:mod:`gluettalax_spark.operators.scalars`.
"""

from gluettalax_spark.functions.scalars import format_time, glob_to_rlike  # noqa: F401
