"""X1 callable property bindings (engine-side ParserProperty).

Ports the reference's custom-parser suite: CustomIsoParser
(tests/tests.py:1417-1460 — new simple prop with attribute fallback + new
complex list reusing the contact structure, exercised at
tests/tests.py:623-678) and UtilityFgdcParser (tests/tests.py:1462-1493 —
every property re-bound through ParserProperty wrappers delegating to the
default logic).  The engine equivalents: declarative chains/ComplexSpec via
extend_spec where the reference needed only locations, and CallableProp
(parse_fn, write_fn) where it needed logic.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path

import pytest

from gmx import xmlkit
from gmx.extract import extract_record
from gmx.serialize import serialize
from gmx.specs import SPECS
from gmx.specs.model import CallableProp, ComplexSpec, extend_spec
from gmx.update import update_document
from gmx.xmlkit import find_all

DATA = Path("/root/reference/gis_metadata/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="reference tree absent")

_CT = "contact/CI_ResponsibleParty"


def _custom_iso_specs(with_callables: bool = True) -> dict:
    """The CustomIsoParser bindings: metadata_language (primary text
    location + codeListValue-attribute fallback) and metadata_contacts
    (contact structure + phone).  The language prop is ALSO bound as a
    CallableProp returning a list — the reference getter's exact shape."""

    callables = {}
    if with_callables:
        callables["metadata_language_list"] = CallableProp(
            parse_fn=_parse_language_list, write_fn=_write_language_list
        )
    return {
        "iso": extend_spec(
            SPECS["iso"],
            simple={
                "metadata_language": (
                    "language/CharacterString",
                    "language/LanguageCode/@codeListValue",
                ),
            },
            complexes={
                "metadata_contacts": ComplexSpec(
                    root=_CT,
                    subs={
                        "name": (f"{_CT}/individualName/CharacterString",),
                        "organization": (f"{_CT}/organisationName/CharacterString",),
                        "position": (f"{_CT}/positionName/CharacterString",),
                        "phone": (
                            f"{_CT}/contactInfo/CI_Contact/phone/CI_Telephone/voice/CharacterString",
                        ),
                        "email": (
                            f"{_CT}/contactInfo/CI_Contact/address/CI_Address/"
                            "electronicMailAddress/CharacterString",
                        ),
                    },
                    is_list=True,
                ),
            },
            callables=callables,
        )
    }


def _parse_language_list(tree, spec):
    """Custom getter: list of language codes, text location first, then the
    codeListValue attribute (the reference getter returns ['eng','esp'])."""

    vals = xmlkit.texts_at(tree, "language/CharacterString")
    if not vals:
        vals = xmlkit.attrs_at(tree, "language/LanguageCode", "codeListValue")
    return list(vals)


def _write_language_list(root, value, spec):
    """Custom setter: owns removal of its managed location (reference setter
    contract) then writes one LanguageCode per value."""

    for parent in find_all(root, ""):
        for child in [c for c in list(parent) if c.tag == "language"]:
            parent.remove(child)
    if not value:
        return
    lang = ET.SubElement(root, "language")
    for v in value:
        el = ET.SubElement(lang, "LanguageCode")
        el.set("codeListValue", v)
        el.text = v


GOLD_CONTACT = {
    "name": "Custom Contact Name",
    "email": "Custom Contact Email",
    "phone": "Custom Contact Phone",
    "position": "Custom Contact Position",
    "organization": "Custom Contact Organization",
}


def test_custom_iso_parser_values():
    """tests/tests.py:626-645: custom props parse from the unmodified ISO
    fixture with built-in fallback semantics."""

    xml = (DATA / "iso_metadata.xml").read_text()
    rec = extract_record(xml, specs=_custom_iso_specs())
    # primary (CharacterString) is absent -> the attribute fallback wins;
    # scalar join delimiter follows the PRIMARY location's kind (element
    # text -> newline), as for every built-in chain
    assert rec["metadata_language"] == "eng\nesp"
    assert rec["metadata_language_list"] == ["eng", "esp"]
    assert rec["metadata_contacts"] == [GOLD_CONTACT]
    # built-ins unaffected
    assert rec["title"] == "Test Title"


def test_custom_iso_parser_reparse_round_trip():
    """tests/tests.py:647-655 (assert_reparsed_complex_for): change the
    custom complex value and the callable value, write back IN PLACE,
    re-extract — both stick, built-ins and unmanaged content survive."""

    specs = _custom_iso_specs()
    xml = (DATA / "iso_metadata.xml").read_text()
    rec = extract_record(xml, specs=specs)
    rec["attributes"] = rec["attributes_inline"]

    changed = {
        "name": "Changed Contact Name",
        "email": "Changed Contact Email",
        "phone": "Changed Contact Phone",
        "position": "Changed Contact Position",
        "organization": "Changed Contact Organization",
    }
    rec["metadata_contacts"] = [changed]
    rec["metadata_language_list"] = ["en", "es"]

    out = update_document(xml, rec, specs=specs)
    back = extract_record(out, specs=specs)
    assert back["metadata_contacts"] == [changed]
    assert back["metadata_language_list"] == ["en", "es"]
    assert back["title"] == "Test Title"
    assert back["abstract"] == "Test Abstract"


def test_custom_props_survive_regeneration():
    """Custom callable write_fn also runs on the regeneration serializer, so
    custom props survive serialize() -> extract_record()."""

    specs = _custom_iso_specs()
    xml = (DATA / "iso_metadata.xml").read_text()
    rec = extract_record(xml, specs=specs)
    rec["attributes"] = rec["attributes_inline"]
    regenerated = serialize(rec, "iso", specs=specs)
    back = extract_record(regenerated, specs=specs)
    assert back["metadata_language_list"] == ["eng", "esp"]
    assert back["metadata_contacts"] == [GOLD_CONTACT]


def test_callable_wrapper_delegating_to_default():
    """UtilityFgdcParser port (tests/tests.py:1462-1493): a CallableProp that
    delegates to the engine's default chain resolution must behave exactly
    like the declarative binding it wraps."""

    fgdc = SPECS["fgdc"]
    title_chain = fgdc.simple["title"]

    def parse_title(tree, spec):
        vals = xmlkit.resolve_chain(tree, title_chain)
        return "\n".join(vals)

    specs = {"fgdc": extend_spec(fgdc, callables={"title": CallableProp(parse_title)})}
    xml = (DATA / "fgdc_metadata.xml").read_text()
    wrapped = extract_record(xml, specs=specs)
    plain = extract_record(xml)
    assert wrapped["title"] == plain["title"] == "Test Title"


def test_callable_props_run_distributed(spark, sf_dir):
    """Callables ride the Arrow mapInPandas closure: a custom parse_fn over
    the synthesized corpus yields one extra column on every executor-parsed
    row, alongside the built-ins."""

    from pyspark.sql import types as T
    from gmx import pipeline

    def n_sections(tree, spec):
        return str(len(list(tree)))

    specs = {
        std: extend_spec(SPECS[std], callables={"n_sections": CallableProp(n_sections)})
        for std in ("fgdc", "iso", "arcgis")
    }
    corpus = pipeline.corpus_df(spark, sf_dir)
    meta = pipeline.metadata_from_corpus(
        corpus,
        specs=specs,
        extra_schema=[T.StructField("n_sections", T.StringType())],
    )
    rows = meta.select("doc_id", "standard", "n_sections").collect()
    assert rows and all(r.n_sections and int(r.n_sections) > 0 for r in rows)
