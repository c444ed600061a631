from newsfeeds_crawler_spark.plans.driver import CrawlConfig, CrawlEngine

__all__ = ["CrawlConfig", "CrawlEngine"]
