from bodhium_webscrapper_spark.plans.checkpoint import SnapshotStore  # noqa: F401
from bodhium_webscrapper_spark.plans.frontier import CrawlConfig, CrawlJob  # noqa: F401
