from bodhium_webscrapper_spark.streaming.frontier_stream import (  # noqa: F401
    host_rate_metrics,
    stream_dedup_urls,
    stream_pages,
    stream_per_host_budget,
)
