"""In-place update preserving unmanaged XML (U1 in-place preservation).

Mirrors the reference's update()+serialize() round-trip semantics
(update_property/update_complex*, /root/reference/gis_metadata/
utils.py:370-522; round-trip tests tests/tests.py:230-339): mutating one
property and writing back must (a) apply the change, (b) keep every other
golden value, and (c) keep elements the spec does not manage — which the
regeneration serializer drops by construction.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from gmx.extract import extract_record
from gmx.update import update_document, update_tree
from gmx.xmlkit import find_all, parse_xml, texts_at, to_string

from tests.test_reference_fixtures import FIXTURES, GOLD

DATA = Path("/root/reference/gis_metadata/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="reference tree absent")

# an element each fixture carries that no spec property manages
UNMANAGED = {
    "fgdc": "idinfo/status/progress",
    "iso": "language/LanguageCode",
    "arcgis": "Esri/DataProperties",
}


def _fixture(std: str) -> str:
    return (DATA / FIXTURES[std]).read_text()


def _stored_rec(xml: str) -> dict:
    rec = extract_record(xml)
    rec["attributes"] = rec["attributes_inline"]
    return rec


@pytest.mark.parametrize("std", list(FIXTURES))
def test_update_one_prop_keeps_everything_else(std):
    """Reference round trip (tests/tests.py:230-339): mutate title, write
    back IN PLACE, re-extract — the new title sticks, all other golden
    values survive, and the unmanaged anchor element is still present."""

    xml = _fixture(std)
    rec = _stored_rec(xml)
    rec["title"] = "Updated Title"

    out = update_document(xml, rec)
    back = extract_record(out)

    assert back["standard"] == std
    assert back["title"] == "Updated Title"
    diffs = {
        k: (back.get(k), want)
        for k, want in GOLD.items()
        if k != "title" and back.get(k) != want
    }
    assert not diffs, diffs

    root = parse_xml(out)
    assert find_all(root, UNMANAGED[std]), "unmanaged element dropped"


@pytest.mark.parametrize("std", list(FIXTURES))
def test_update_identity_round_trip(std):
    """Updating with the unmodified record is a value-level no-op."""

    xml = _fixture(std)
    out = update_document(xml, _stored_rec(xml))
    back = extract_record(out)
    diffs = {k: (back.get(k), want) for k, want in GOLD.items() if back.get(k) != want}
    assert not diffs, diffs
    assert find_all(parse_xml(out), UNMANAGED[std])


def test_iso_unmanaged_details_survive():
    """ISO specifics: LanguageCode texts AND attributes survive, and the
    feature-catalog citation href (attr_catalog_url) is preserved."""

    xml = _fixture("iso")
    rec = _stored_rec(xml)
    rec["abstract"] = "New Abstract"
    root = parse_xml(update_document(xml, rec))
    codes = find_all(root, "language/LanguageCode")
    assert [c.text for c in codes] == ["eng", "esp"]
    assert all(c.get("codeList") for c in codes)
    back = extract_record(to_string(root))
    assert back["abstract"] == "New Abstract"
    assert (
        back["attr_catalog_url"]
        == "http://www.isotc211.org/2005/gfc/resources/example/G_3.xml"
    )


@pytest.mark.parametrize("std", list(FIXTURES))
def test_update_complex_and_keywords(std):
    """Mutate a complex list entry, a keyword list, and the dates type in one
    pass — the reference's update-everything write loop."""

    xml = _fixture(std)
    rec = _stored_rec(xml)
    rec["contacts"] = [dict(rec["contacts"][0], email="new@example.com")]
    rec["place_keywords"] = ["Idaho"]
    rec["dates"] = {"type": "range", "values": ["2001-01-01", "2002-02-02"]}

    back = extract_record(update_document(xml, rec))
    assert [c["email"] for c in back["contacts"]] == ["new@example.com"]
    assert len(back["contacts"]) == 1
    assert back["place_keywords"] == ["Idaho"]
    assert back["dates"] == {"type": "range", "values": ["2001-01-01", "2002-02-02"]}
    # untouched props survive
    assert back["bounding_box"] == GOLD["bounding_box"]
    assert back["digital_forms"] == GOLD["digital_forms"]


@pytest.mark.parametrize("std", list(FIXTURES))
def test_update_removes_emptied_props(std):
    """An emptied property removes its managed elements (update with empty
    values = removal, utils.py:392-401) without touching neighbors."""

    xml = _fixture(std)
    rec = _stored_rec(xml)
    rec["purpose"] = ""
    back = extract_record(update_document(xml, rec))
    assert back["purpose"] == ""
    assert back["abstract"] == GOLD["abstract"]
    assert find_all(parse_xml(update_document(xml, rec)), UNMANAGED[std])


def test_iso_foreign_keyword_group_survives():
    """A descriptiveKeywords group of an unmanaged type (e.g. 'discipline')
    must survive an update that rewrites the managed keyword kinds —
    IsoParser._update_keywords scopes removal by type the same way."""

    xml = _fixture("iso")
    root = parse_xml(xml)
    # plant a foreign-typed keyword group next to the managed ones
    groups = find_all(root, "identificationInfo/MD_DataIdentification/descriptiveKeywords")
    assert groups
    parent = find_all(root, "identificationInfo/MD_DataIdentification")[0]
    import xml.etree.ElementTree as ET

    g = ET.SubElement(parent, "descriptiveKeywords")
    kw = ET.SubElement(ET.SubElement(g, "MD_Keywords"), "keyword")
    ET.SubElement(kw, "CharacterString").text = "ForeignKeyword"
    tcode = ET.SubElement(
        ET.SubElement(find_all(g, "MD_Keywords")[0], "type"), "MD_KeywordTypeCode"
    )
    tcode.text = "discipline"

    planted_xml = to_string(root)
    rec = _stored_rec(planted_xml)
    rec["place_keywords"] = ["Replaced Place"]
    out_root = parse_xml(update_document(planted_xml, rec))

    texts = texts_at(
        out_root,
        "identificationInfo/MD_DataIdentification/descriptiveKeywords/"
        "MD_Keywords/keyword/CharacterString",
    )
    assert "ForeignKeyword" in texts
    back = extract_record(to_string(out_root))
    assert back["place_keywords"] == ["Replaced Place"]
    assert back["thematic_keywords"] == GOLD["thematic_keywords"]


def test_distributed_update_with_custom_prop(spark, tmp_path):
    """X2 symmetry on the write path: a custom property extends the spec,
    extracts distributed, is set on the DataFrame, and update_corpus_df
    writes it into the ORIGINAL documents in place — built-ins and
    unmanaged anchors untouched."""
    import shutil

    from pyspark.sql import functions as F, types as T
    from gmx import pipeline as P
    from gmx.ingest import corpus_from_xml_files
    from gmx.specs import SPECS
    from gmx.specs.model import extend_spec
    from gmx.update import update_corpus_df

    for name in FIXTURES.values():
        shutil.copy(DATA / name, tmp_path / name)
    specs = {
        "fgdc": extend_spec(SPECS["fgdc"], simple={"editor_note": ("idinfo/editor_note",)})
    }

    corpus = corpus_from_xml_files(spark, str(tmp_path)).persist()
    meta = P.metadata_from_corpus(
        corpus, persist=False, specs=specs,
        extra_schema=[T.StructField("editor_note", T.StringType())],
    )
    mutated = meta.withColumn(
        "editor_note",
        F.when(F.col("standard") == "fgdc", F.lit("added by update")).otherwise(F.lit("")),
    )
    updated = update_corpus_df(corpus, mutated, specs=specs, extra_fields=["editor_note"])

    back = P.metadata_from_corpus(
        updated, persist=False, specs=specs,
        extra_schema=[T.StructField("editor_note", T.StringType())],
    )
    rows = {r.standard: r for r in back.select("standard", "title", "editor_note").collect()}
    assert rows["fgdc"].editor_note == "added by update"
    assert all(r.title == "Test Title" for r in rows.values())
    # unmanaged anchor survives the distributed update
    fgdc_xml = (
        P.with_document_text(updated)
        .filter(F.col("xml").contains("<idinfo>"))
        .filter(F.col("xml").contains("editor_note"))
        .first()
        .xml
    )
    assert find_all(parse_xml(fgdc_xml), UNMANAGED["fgdc"])


def test_update_corpus_passes_through_unparseable_docs(spark):
    """A record paired with broken spans (caller-built input) must pass the
    document through untouched, not kill the task."""
    from pyspark.sql import functions as F
    from gmx import pipeline as P
    from gmx.schema import CORPUS_SCHEMA
    from gmx.update import update_corpus_df

    corpus = spark.createDataFrame(
        [("bad-1", [("text", "<<< not xml", "", 0)])], schema=CORPUS_SCHEMA
    )
    # force a matching record despite the broken document (extract_wide
    # yields an error row with standard=''; pretend a caller labeled it)
    meta = P.extract_wide(P.with_document_text(corpus)).withColumn(
        "standard", F.lit("fgdc")
    )
    out = update_corpus_df(corpus, meta).collect()
    assert len(out) == 1
    assert out[0].spans[0].text == "<<< not xml"


def test_update_tree_is_in_place():
    """update_tree mutates the given root (no copy) and returns it."""

    root = parse_xml(_fixture("fgdc"))
    rec = _stored_rec(_fixture("fgdc"))
    rec["title"] = "T2"
    out = update_tree(root, rec, "fgdc")
    assert out is root
    assert texts_at(root, "idinfo/citation/citeinfo/title") == ["T2"]
