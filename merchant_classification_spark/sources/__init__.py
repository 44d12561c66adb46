from merchant_classification_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from merchant_classification_spark.sources.text import write_single_text_file

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "write_single_text_file",
]
