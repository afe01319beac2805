"""Schema introspection round-trip (the reference's ``schema()`` hook,
task.ts:78-91): a registered query's published schema JSON must parse
back via ``StructType.fromJson`` into exactly the schema the built
DataFrame resolves to — no job may run to produce it."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from etl_verkada_spark.introspect import query_schema, schemas, table_schemas
from etl_verkada_spark.registry import build_registry

from .conftest import SF_SMALL

#: a cross-family sample, including one land-then-read scan (whose
#: DataFrame construction lands files as a side effect) and one
#: pandas-UDF query (schema comes from the declared UDF return type).
SAMPLE = [
    "flagship_flat",
    "agg_groupby",
    "win_rownum",
    "scan_json_land",
    "llm_dedup_embed",
    "llm_sim_search",
    "fx_json",
    "join_bucketed",
]


def test_schema_json_round_trips(spark):
    out = schemas(spark, SAMPLE, SF_SMALL)
    assert set(out) == set(SAMPLE)
    registry = build_registry()
    for name, js in out.items():
        parsed = T.StructType.fromJson(json.loads(js))
        built = registry[name].fn(spark, SF_SMALL).schema
        assert parsed == built, name


def test_query_schema_matches_result_columns(spark):
    """The published schema is the schema of the rows a consumer gets."""
    schema = query_schema(spark, "llm_sim_search", SF_SMALL)
    df = build_registry()["llm_sim_search"].fn(spark, SF_SMALL)
    rows = df.limit(1).collect()
    assert [f.name for f in schema.fields] == list(df.columns)
    if rows:
        assert set(rows[0].asDict()) == {f.name for f in schema.fields}


def test_query_schema_unknown_name_raises(spark):
    with pytest.raises(KeyError):
        query_schema(spark, "no_such_query", SF_SMALL)


def test_table_schemas_cover_catalog(spark):
    out = table_schemas(spark, SF_SMALL)
    # every catalog table is present and round-trips
    for name, js in out.items():
        st = T.StructType.fromJson(json.loads(js))
        assert isinstance(st, T.StructType) and len(st.fields) > 0, name
    # the events ns-timestamp quirk is normalized in the published schema
    ev = T.StructType.fromJson(json.loads(out["events"]))
    assert dict((f.name, f.dataType.simpleString()) for f in ev.fields)[
        "ts"
    ] == "timestamp_ntz"
