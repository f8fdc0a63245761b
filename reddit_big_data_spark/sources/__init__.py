from reddit_big_data_spark.sources.io import (  # noqa: F401
    read_csv,
    read_table,
    read_tables,
    rename_with_suffix,
    write_csv,
    write_parquet,
)
