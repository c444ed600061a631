from newsfeeds_crawler_spark.sources.frontier import (  # noqa: F401
    generative_frontier,
    generative_seen,
    mk_url_expr,
    write_bucketed,
)
