"""Property-based round-trip: arbitrary well-formed records survive
serialize -> extract in every standard (hypothesis over the value space the
reference's type system allows — text, lists of text, fixed-key structs)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from gmx.extract import empty_record, extract_record
from gmx.serialize import serialize

# XML-safe text without the reference's structural delimiters: no newlines
# (multi-value join), no commas (attribute-value join), non-empty, stripped
# (ElementTree drops pure-whitespace text).
_ALPHABET = string.ascii_letters + string.digits + " _.:/()&<>'\"-"
text = (
    st.text(alphabet=_ALPHABET, min_size=1, max_size=30)
    .map(str.strip).filter(bool)
)
# attribute values additionally exclude ','
attr_text = text.filter(lambda s: "," not in s)
maybe = st.one_of(st.just(""), text)
texts = st.lists(text, min_size=0, max_size=3)


digits = st.text(alphabet=string.digits, min_size=1, max_size=5)

# keyword kinds only the ArcGIS data map binds; FGDC/ISO drop them on write
ARCGIS_ONLY_KEYWORDS = (
    "discipline_keywords", "other_keywords", "product_keywords",
    "search_keywords", "topic_category_keywords",
)


@st.composite
def records(draw):
    rec = empty_record()
    rec["title"] = draw(text)
    rec["abstract"] = draw(maybe)
    rec["purpose"] = draw(maybe)
    rec["supplementary_info"] = draw(maybe)
    rec["dist_liability"] = draw(maybe)
    rec["originators"] = "\n".join(draw(texts)) or draw(text)
    rec["use_constraints"] = draw(maybe)
    rec["dist_address_type"] = draw(st.one_of(st.just(""), attr_text))
    rec["place_keywords"] = draw(texts)
    rec["thematic_keywords"] = draw(texts)
    rec["stratum_keywords"] = draw(texts)
    rec["temporal_keywords"] = draw(texts)
    rec["search_keywords"] = draw(texts)
    dt = draw(st.sampled_from(["none", "single", "range", "multiple"]))
    if dt == "single":
        rec["dates"] = {"type": "single", "values": [draw(text)]}
    elif dt == "range":
        rec["dates"] = {"type": "range", "values": [draw(text), draw(text)]}
    elif dt == "multiple":
        rec["dates"] = {"type": "multiple",
                        "values": draw(st.lists(text, min_size=2, max_size=4))}
    rec["bounding_box"] = draw(st.one_of(st.none(), st.just(
        {"east": "10.5", "south": "-5.0", "west": "-10.5", "north": "5.0"})))
    rec["contacts"] = draw(st.lists(st.fixed_dictionaries({
        "name": text, "email": text, "organization": text, "position": text,
    }), max_size=2))
    rec["process_steps"] = draw(st.lists(st.fixed_dictionaries({
        "description": text, "date": text,
        "sources": st.lists(text, max_size=2),
    }), max_size=2))
    # the high-semantic-risk complexes: zip-merge + ISO sentinel split
    # (digital_forms), dims pivot/unpivot (raster_info), nested citation
    # struct with a multi-valued sub (larger_works), aliases defaulting
    # (attributes)
    rec["digital_forms"] = draw(st.lists(st.fixed_dictionaries({
        "name": text, "content": maybe, "decompression": maybe,
        "version": maybe, "specification": maybe,
        "access_desc": maybe, "access_instrs": maybe, "network_resource": maybe,
    }), max_size=2))
    if draw(st.booleans()):
        rec["raster_info"] = {
            "dimensions": draw(digits), "row_count": draw(digits),
            "column_count": draw(digits), "vertical_count": draw(digits),
            "x_resolution": draw(maybe), "y_resolution": draw(maybe),
        }
    if draw(st.booleans()):
        rec["larger_works"] = {
            "title": draw(text), "edition": draw(maybe),
            "origin": draw(st.lists(text, min_size=1, max_size=2)),
            "online_linkage": draw(maybe), "other_citation": draw(maybe),
            "publish_date": draw(maybe), "publish_place": draw(maybe),
            "publish_info": draw(maybe),
        }
    rec["attributes"] = draw(st.lists(st.fixed_dictionaries({
        "label": text, "aliases": maybe,
        "definition": maybe, "definition_source": maybe,
    }), max_size=2))
    return rec


def _expected(key, want, standard):
    """Engine normalization applied to a generated value before comparison."""

    if key in ARCGIS_ONLY_KEYWORDS and standard != "arcgis":
        return []
    if key == "process_steps":
        return [
            {**s, "sources": [x for x in s["sources"] if x]}
            for s in want
            if s["description"] or s["date"] or any(s["sources"])
        ]
    if key == "contacts":
        return [c for c in want if any(c.values())]
    if key == "attributes":
        # the aliases := label default is ISO-only (the reference's C9,
        # IsoParser._parse_attribute_details); FGDC/ArcGIS keep raw values
        if standard == "iso":
            return [
                {**a, "aliases": a["aliases"] or a["label"]}
                for a in want
                if any(a.values())
            ]
        return [a for a in want if any(a.values())]
    if key == "digital_forms":
        if standard == "fgdc":
            # one digform element carries both halves: positions survive
            return [f for f in want if any(f.values())]
        # ISO/ArcGIS: format structs and transfer-option structs live in
        # SEPARATE repeated elements; parse drops all-empty structs from each
        # list independently (reference parse_complex_list, utils.py:277-293)
        # and then zips positionally (C5) — so a form with an empty transfer
        # half shifts later transfer halves up.  Model exactly that.
        fmt_subs = ("name", "content", "decompression", "version", "specification")
        xfer_subs = ("access_desc", "access_instrs", "network_resource")
        fmts = [
            {k: f[k] for k in fmt_subs} for f in want if any(f[k] for k in fmt_subs)
        ]
        xfers = [
            {k: f[k] for k in xfer_subs} for f in want if any(f[k] for k in xfer_subs)
        ]
        merged = []
        for i in range(max(len(fmts), len(xfers))):
            m = {k: "" for k in fmt_subs + xfer_subs}
            if i < len(fmts):
                m.update(fmts[i])
            if i < len(xfers):
                m.update(xfers[i])
            merged.append(m)
        return merged
    return want


@settings(max_examples=60, deadline=None)
@given(rec=records(), standard=st.sampled_from(["fgdc", "iso", "arcgis"]))
def test_roundtrip_arbitrary_records(rec, standard):
    out = extract_record(serialize(rec, standard))
    assert out["standard"] == standard
    for key, want in rec.items():
        if key == "attributes_inline":
            continue  # derived from `attributes` pre-aliasing; not independent
        got = out[key]
        want = _expected(key, want, standard)
        assert got == want, f"{standard}.{key}: {want!r} != {got!r}"


@settings(max_examples=40, deadline=None)
@given(
    rec=records(),
    src=st.sampled_from(["fgdc", "iso", "arcgis"]),
    dst=st.sampled_from(["fgdc", "iso", "arcgis"]),
)
def test_conversion_equality_arbitrary_records(rec, src, dst):
    """The reference's conversion invariant (tests/tests.py:281-298: every
    ordered standard pair converts losslessly) over RANDOM records: extract
    from src dialect, re-serialize in dst dialect, re-extract — every
    property must survive except the ArcGIS-only keyword kinds leaving the
    ArcGIS dialect."""

    r1 = extract_record(serialize(rec, src))
    r2 = extract_record(serialize(r1, dst))
    assert r2["standard"] == dst
    for key, want in r1.items():
        if key in ("standard", "error", "attributes_inline"):
            continue
        # the dst dialect re-applies its own normalizations (ArcGIS-only
        # keyword drop, ISO aliases default, separated-halves form merge)
        want = _expected(key, want, dst)
        assert r2[key] == want, f"{src}->{dst}.{key}: {want!r} != {r2[key]!r}"
