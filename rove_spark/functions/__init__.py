from rove_spark.functions.durations import Duration, parse_iso8601  # noqa: F401
