from newsfeeds_crawler_spark.functions import codecs, predicates, text, urls

__all__ = ["urls", "codecs", "text", "predicates"]
