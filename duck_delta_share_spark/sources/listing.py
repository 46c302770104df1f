"""Catalog discovery as DataFrames — the ``delta_share_list`` surface
(§A1-A4): tiny driver-side REST listings materialized as LocalRelations
with the reference's fixed schemas
(`/root/reference/src/duck_delta_share_extension.cpp:45-73`): shares →
(name, id), schemas → (name, share, id), tables → (name, schema, share,
id); missing ids coalesce to "" (extension.cpp:109-110). Listings are
bounded catalog metadata, so a single driver HTTP call + LocalRelation is
the right plan at any scale (no executor involvement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duck_delta_share_spark.client import DeltaSharingClient

SHARES_SCHEMA = "name string, id string"
SCHEMAS_SCHEMA = "name string, share string, id string"
TABLES_SCHEMA = "name string, schema string, share string, id string"


def list_shares_df(spark: SparkSession, client: DeltaSharingClient) -> DataFrame:
    rows = [(s.name, s.id) for s in client.list_shares()]
    return spark.createDataFrame(rows, SHARES_SCHEMA)


def list_schemas_df(spark: SparkSession, client: DeltaSharingClient, share: str) -> DataFrame:
    rows = [(s.name, s.share, s.id) for s in client.list_schemas(share)]
    return spark.createDataFrame(rows, SCHEMAS_SCHEMA)


def list_tables_df(
    spark: SparkSession, client: DeltaSharingClient, share: str, schema: str
) -> DataFrame:
    rows = [(t.name, t.schema, t.share, t.id) for t in client.list_tables(share, schema)]
    return spark.createDataFrame(rows, TABLES_SCHEMA)


def list_all_tables_df(spark: SparkSession, client: DeltaSharingClient, share: str) -> DataFrame:
    rows = [(t.name, t.schema, t.share, t.id) for t in client.list_all_tables(share)]
    return spark.createDataFrame(rows, TABLES_SCHEMA)


def delta_share_list(
    spark: SparkSession,
    client: DeltaSharingClient,
    share: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Arity dispatch exactly like the reference's ``delta_share_list``
    (extension.cpp:42-74): no args → shares, share → schemas,
    share+schema → tables."""
    if share is None:
        return list_shares_df(spark, client)
    if schema is None:
        return list_schemas_df(spark, client, share)
    return list_tables_df(spark, client, share, schema)


def register_share(
    spark: SparkSession,
    client: DeltaSharingClient,
    share: str,
    name_format: str = "{schema}_{table}",
) -> list[str]:
    """Register every table of a share as a temp view, so users drive the
    whole share from SQL text — the Spark equivalent of composing DuckDB
    SQL over ``delta_share_read`` (the reference's primary UX,
    `/root/reference/src/duck_delta_share_extension.cpp:495-629`).

    View creation is lazy metadata only (one listing call; table schemas
    resolve on first query). Returns the created view names.
    """
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    views = []
    for t in client.list_all_tables(share):
        view = name_format.format(share=t.share, schema=t.schema, table=t.name)
        df = (
            spark.read.format("deltashare")
            .option("endpoint", client.profile.endpoint)
            .option("bearerToken", client.profile.bearer_token)
            .load(f"{t.share}.{t.schema}.{t.name}")
        )
        df.createOrReplaceTempView(view)
        views.append(view)
    return views
