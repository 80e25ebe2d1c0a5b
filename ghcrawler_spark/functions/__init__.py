from ghcrawler_spark.functions import text, urls, vectors  # noqa: F401
