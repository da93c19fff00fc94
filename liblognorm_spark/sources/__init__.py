from liblognorm_spark.sources.readers import read_logs

__all__ = ["read_logs"]
