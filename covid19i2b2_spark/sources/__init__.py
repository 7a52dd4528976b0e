from covid19i2b2_spark.sources.tables import read_table, register_views  # noqa: F401
from covid19i2b2_spark.sources.sinks import write_csv, write_parquet  # noqa: F401
