"""Source/sink layer: typed readers for text/csv/json/parquet/binary
inputs and the report sink (SURVEY.md §2 B.1, ref A1/A12)."""
