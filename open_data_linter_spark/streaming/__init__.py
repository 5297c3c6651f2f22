from open_data_linter_spark.streaming.validate import validate_stream, read_clip_stream  # noqa: F401
