from open_data_linter_spark.sources.tpch import load_tables, TPCH_TABLES  # noqa: F401
