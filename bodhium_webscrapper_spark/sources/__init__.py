from bodhium_webscrapper_spark.sources.datagen import (  # noqa: F401
    generate_crawl_fixture,
    prepare_pages,
)
