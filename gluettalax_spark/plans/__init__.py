"""Control plane: catalog, partition DDL, and crawler (schema inference).

This is the layer the reference implements directly (SURVEY.md §1-2:
Glue Data Catalog operations), re-expressed over ``spark.catalog`` and
Spark SQL DDL on a local warehouse.
"""

from gluettalax_spark.plans.catalog import (  # noqa: F401
    Crawler,
    add_partition,
    add_partitions_by_location,
    create_database,
    create_external_table,
    delete_partition,
    get_partition_values,
    list_partitions,
    list_tables,
    run_crawler,
)
