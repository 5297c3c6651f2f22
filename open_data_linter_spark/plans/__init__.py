from open_data_linter_spark.plans.run import ValidationRun, RunReport  # noqa: F401
