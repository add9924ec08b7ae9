from spark_validate.io.store import FittedStore
from spark_validate.io.readers import read_source, read_table, save_catalog_table, write_results
from spark_validate.io.db import DatabaseWriter

__all__ = ["FittedStore", "read_source", "read_table", "save_catalog_table", "write_results", "DatabaseWriter"]
