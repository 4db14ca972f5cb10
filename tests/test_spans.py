"""Span-contract tests: per-document span-sequence equality (kind, text,
media_ref, order) — the primary invariant per BASELINE.json input_hint."""

from __future__ import annotations

from gmx.corpus import (
    bbox_halfdeg,
    catalog_kind,
    generate_rows,
    make_record,
    make_spans,
    standard_of,
)
from gmx.extract import extract_record
from gmx.serialize import serialize, serialize_sections

SAMPLE_IDS = [0, 1, 2, 5, 10, 25, 75, 97, 100, 194, 485]


def test_spans_reassemble_to_document():
    for i in SAMPLE_IDS:
        spans = make_spans(i)
        text = "".join(t for (k, t, _, _) in spans if k == "text")
        assert text == serialize(make_record(i), standard_of(i))


def test_span_offsets_monotonic_and_exact():
    for i in SAMPLE_IDS:
        pos = 0
        for kind, text, media_ref, offset in make_spans(i):
            assert offset == pos
            pos += len(text)
            if kind == "media":
                assert text == "" and media_ref
            else:
                assert media_ref == ""


def test_span_sequence_round_trip():
    """reassemble -> extract -> serialize -> re-split reproduces the original
    span sequence exactly (kind, text, media_ref, order)."""

    for i in SAMPLE_IDS:
        spans = make_spans(i)
        std = standard_of(i)
        xml = "".join(t for (k, t, _, _) in spans if k == "text")
        rec = extract_record(xml)
        # media refs are row-level, not XML-level: carried alongside
        rec["attr_catalog_url"] = rec.get("attr_catalog_url", "")
        sections = serialize_sections(rec, std)
        text_spans = [t for (k, t, _, _) in spans if k == "text"]
        assert sections == text_spans, f"doc {i} ({std})"


def test_media_spans_for_raster_and_catalog_docs():
    rows = dict(generate_rows(range(0, 120)))
    for i in range(0, 120):
        spans = rows[f"doc-{i:08d}"]
        media = [m for (k, _, m, _) in spans if k == "media"]
        if i % 5 == 1:
            assert any(m.startswith("tile://") for m in media), i
        if catalog_kind(i) == "ok":
            assert f"catalog://{i}" in media
            cat = rows[f"cat-{i:08d}"]
            assert [m for (k, _, m, _) in cat if k == "media"] == [f"catalog://{i}"]
        if catalog_kind(i) == "broken":
            assert f"cat-{i:08d}" not in rows
            assert any(m.startswith("catalog://missing/") for m in media)


def test_whole_world_bbox_planted():
    assert bbox_halfdeg(0) == (-360, -180, 360, 180)
    assert bbox_halfdeg(97) == (-360, -180, 360, 180)
    w, s, e, n = bbox_halfdeg(98)
    assert -360 <= w <= e <= 360 and -180 <= s <= n <= 180
