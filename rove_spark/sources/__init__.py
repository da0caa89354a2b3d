from rove_spark.sources.synthetic import synthetic_transcripts  # noqa: F401
from rove_spark.sources.tables import load_testdata, read_table  # noqa: F401
