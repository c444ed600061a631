from newsfeeds_crawler_spark.oracle.refsim import OracleResult, simulate

__all__ = ["OracleResult", "simulate"]
