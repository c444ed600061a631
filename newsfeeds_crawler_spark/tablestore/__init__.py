from newsfeeds_crawler_spark.tablestore.catalog import Catalog

__all__ = ["Catalog"]
