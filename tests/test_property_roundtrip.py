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


@st.composite
def records(draw):
    rec = empty_record()
    rec["title"] = draw(text)
    rec["abstract"] = draw(maybe)
    rec["originators"] = "\n".join(draw(texts)) or draw(text)
    rec["use_constraints"] = draw(maybe)
    rec["dist_address_type"] = draw(st.one_of(st.just(""), attr_text))
    rec["place_keywords"] = draw(texts)
    rec["thematic_keywords"] = draw(texts)
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
    return rec


@settings(max_examples=60, deadline=None)
@given(rec=records(), standard=st.sampled_from(["fgdc", "iso", "arcgis"]))
def test_roundtrip_arbitrary_records(rec, standard):
    out = extract_record(serialize(rec, standard))
    assert out["standard"] == standard
    for key, want in rec.items():
        got = out[key]
        # empty-vs-missing normalization: the engine's defaults
        if key == "process_steps":
            want = [
                {**s, "sources": [x for x in s["sources"] if x]}
                for s in want
                if s["description"] or s["date"] or any(s["sources"])
            ]
        if key == "contacts":
            want = [c for c in want if any(c.values())]
        assert got == want, f"{standard}.{key}: {want!r} != {got!r}"
