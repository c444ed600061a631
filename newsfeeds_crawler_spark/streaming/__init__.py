from newsfeeds_crawler_spark.streaming.frontier_stream import (  # noqa: F401
    host_fetch_windows,
    stream_crawl,
)
