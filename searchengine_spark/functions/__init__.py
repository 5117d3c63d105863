from searchengine_spark.functions import porter, textproc  # noqa: F401
