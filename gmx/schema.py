"""Spark schemas for the span corpus and the wide metadata DataFrame.

Typing follows the reference's deliberately-narrow type system (everything is
text; see SURVEY.md §1.2 and /root/reference/gis_metadata/utils.py:546-547):
parity columns are strings / arrays of strings / structs of strings; numeric
casts happen only in the derived geometry layer (gmx.geometry)."""

from __future__ import annotations

from pyspark.sql import types as T

from gmx.specs import COMPLEX_FIELDS, KEYWORD_PROPS, SIMPLE_PROPS

SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

CORPUS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
])


def _str_struct(fields: tuple[str, ...], multi: set[str] = frozenset()) -> T.StructType:
    return T.StructType([
        T.StructField(f, T.ArrayType(T.StringType()) if f in multi else T.StringType())
        for f in fields
    ])


METADATA_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType()),
     T.StructField("standard", T.StringType()),
     T.StructField("error", T.StringType())]
    + [T.StructField(p, T.StringType()) for p in SIMPLE_PROPS]
    + [T.StructField(p, T.ArrayType(T.StringType())) for p in KEYWORD_PROPS]
    + [
        T.StructField(p, T.ArrayType(T.StringType()))
        for p in (
            "discipline_keywords", "other_keywords", "product_keywords",
            "search_keywords", "topic_category_keywords",
        )
    ]
    + [
        T.StructField("bounding_box", _str_struct(COMPLEX_FIELDS["bounding_box"])),
        T.StructField("dates", T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("values", T.ArrayType(T.StringType())),
        ])),
        T.StructField("larger_works", _str_struct(COMPLEX_FIELDS["larger_works"], {"origin"})),
        T.StructField("raster_info", _str_struct(COMPLEX_FIELDS["raster_info"])),
        T.StructField("attributes", T.ArrayType(_str_struct(COMPLEX_FIELDS["attributes"]))),
        # pre-catalog-resolution inline attributes (kept so the span-sequence
        # round trip stays byte-exact for docs whose attributes resolve
        # remotely; the reference analogue is the original tree's inline
        # eainfo/featureType content before update() rewrites it)
        T.StructField("attributes_inline", T.ArrayType(_str_struct(COMPLEX_FIELDS["attributes"]))),
        T.StructField("contacts", T.ArrayType(_str_struct(COMPLEX_FIELDS["contacts"]))),
        T.StructField("digital_forms", T.ArrayType(_str_struct(COMPLEX_FIELDS["digital_forms"]))),
        T.StructField("process_steps", T.ArrayType(_str_struct(COMPLEX_FIELDS["process_steps"], {"sources"}))),
        T.StructField("attr_catalog_url", T.StringType()),
        T.StructField("media_refs", T.ArrayType(T.StringType())),
    ]
)

CATALOG_ATTRS_SCHEMA = T.StructType([
    T.StructField("catalog_url", T.StringType()),
    T.StructField("remote_attributes", T.ArrayType(_str_struct(COMPLEX_FIELDS["attributes"]))),
])
