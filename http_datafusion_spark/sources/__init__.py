from http_datafusion_spark.sources.http_json import (
    fetch_json,
    fetch_rows,
    json_rows_to_df,
    register_http_table,
)

__all__ = ["fetch_json", "fetch_rows", "json_rows_to_df", "register_http_table"]
