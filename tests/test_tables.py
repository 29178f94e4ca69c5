"""Source resolution: parquet paths and catalog table names (sources.tables)."""

from elasticsearch_aggregation_geoclustering_spark.sources.tables import load_table


def test_load_table_parquet_path(spark):
    df = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0
    assert "text" in df.columns


def test_load_table_catalog_name(spark):
    src = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    src.createOrReplaceTempView("docs_view_for_loader")
    df = load_table(spark, "docs_view_for_loader")
    assert df.count() == src.count()
