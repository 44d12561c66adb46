from merchant_classification_spark.sources.partitioned import (
    read_partitioned,
    write_partitioned,
)
from merchant_classification_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
    split_scan,
)
from merchant_classification_spark.sources.text import read_text, write_single_text_file

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_partitioned",
    "read_text",
    "register_views",
    "split_scan",
    "write_partitioned",
    "write_single_text_file",
]
