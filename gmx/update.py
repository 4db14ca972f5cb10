"""In-place document update: write a record's managed properties into the
ORIGINAL XML tree, leaving everything else untouched.

Re-derives the reference's mutate-the-tree write path (update_property /
update_complex / update_complex_list, /root/reference/gis_metadata/
utils.py:370-522; round-trip behavior tests/tests.py:230-339): for every
supported property the managed locations are first removed — the primary
path AND the alternate (leading-underscore) locations, the reference's
secondary-location-erasure rule (utils.py:390-391) — then the record's
values are re-inserted at the primary location using the same write rules
as the regeneration serializer.  Elements the spec does not manage survive
verbatim, so "load, fix one field, write back" preserves a real-world
document's unmanaged content (the regeneration path in gmx.serialize drops
it by construction).

Spark surface: :func:`update_corpus_df` — one Arrow ``mapInPandas`` pass
over (spans, record) rows: reassemble XML, parse, clear+write, re-split into
the span contract.  Narrow after the single doc_id equi-join; no per-row
Python UDFs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gmx.specs import SPECS
from gmx.serialize import write_into
from gmx.xmlkit import BadContent, find_all, parse_xml, split_attr, to_string


def _remove_path(root: ET.Element, path: str) -> None:
    """Remove every element at ``path`` (or pop the attribute for ``@``
    paths) — the reference's remove_element / remove_element_attributes."""

    base, attr = split_attr(path)
    if attr is not None:
        for el in find_all(root, base) if base else [root]:
            el.attrib.pop(attr, None)
        return
    steps = [s for s in base.split("/") if s]
    if not steps:
        return
    parent_path, last = "/".join(steps[:-1]), steps[-1]
    for parent in find_all(root, parent_path):
        for child in [c for c in list(parent) if c.tag == last]:
            parent.remove(child)


def _remove_chain(root: ET.Element, chain) -> None:
    for p in chain or ():
        if p:
            _remove_path(root, p)


def clear_managed(root: ET.Element, spec) -> None:
    """Remove every location the spec manages (primary + alternates) —
    run before write_into so stale values never linger, and so a property
    write can never be clobbered by another property's alternate removal
    (all removals happen first)."""

    for prop, chain in spec.simple.items():
        _remove_chain(root, chain)

    for chain in (spec.keywords or {}).values():
        _remove_chain(root, chain)
    for chain in (spec.extra_keywords or {}).values():
        _remove_chain(root, chain)

    # ISO typed keyword groups: drop only groups whose type code matches a
    # managed kind — foreign-typed descriptiveKeywords groups are unmanaged
    # and survive (IsoParser._update_keywords scopes removal the same way,
    # iso_metadata_parser.py:581-609)
    for g in (spec.keyword_groups or {}).values():
        steps = [s for s in g.root.split("/") if s]
        parent_path, last = "/".join(steps[:-1]), steps[-1]
        for parent in find_all(root, parent_path):
            for child in [c for c in list(parent) if c.tag == last]:
                types = [
                    (e.text or "").strip() for e in find_all(child, g.type_path)
                ]
                if g.type_value in types:
                    parent.remove(child)

    # complex structs/lists: remove the owning subtree(s) (update_complex /
    # update_complex_list both start with remove_element(root, True),
    # utils.py:477/506) plus any sub chain living OUTSIDE the root (e.g.
    # FGDC raster resolutions under spref/) — those are managed alternates
    for prop, cspec in spec.complexes.items():
        _remove_path(root, cspec.root)
        for chain in cspec.subs.values():
            for p in chain:
                if p and not p.startswith(cspec.root):
                    _remove_path(root, p)
    if spec.transfer_options is not None:
        _remove_path(root, spec.transfer_options.root)

    # dates: remove the shared per-type container (the reference removes the
    # dates root then re-inserts, metadata_parser.py:327-351)
    _remove_path(root, spec.dates.root)

    if spec.raster_dims is not None:
        _remove_path(root, spec.raster_dims.root)
        _remove_chain(root, spec.raster_dims.num_dims_chain)

    # typed report elements: remove only reports carrying a managed type
    # attribute — other report types are unmanaged
    for r in (spec.report_items or {}).values():
        steps = [s for s in r.root.split("/") if s]
        parent_path, last = "/".join(steps[:-1]), steps[-1]
        for parent in find_all(root, parent_path):
            for child in [c for c in list(parent) if c.tag == last]:
                if child.get(r.attr) == r.attr_value:
                    parent.remove(child)

    _remove_chain(root, spec.attr_catalog_url)


def update_tree(
    root: ET.Element, rec: dict, standard: str | None = None, specs: dict | None = None
) -> ET.Element:
    """Clear managed locations, then write ``rec`` at the primaries —
    everything the spec does not manage survives in place.  ``specs``: the
    same per-standard override surface as extract_record (custom X1/X2
    properties update in place too — their write_fn owns removal)."""

    spec = (SPECS if specs is None else {**SPECS, **specs})[standard or rec["standard"]]
    clear_managed(root, spec)
    write_into(root, rec, spec)
    return root


def update_document(
    xml: str, rec: dict, standard: str | None = None, specs: dict | None = None
) -> str:
    root = parse_xml(xml)
    update_tree(root, rec, standard, specs)
    return to_string(root)


def _sections(root: ET.Element) -> list[str]:
    """Top-level section split of an existing tree (same span contract as
    serialize_sections, which only handles freshly built roots).

    The root open tag is serialized through ElementTree so attributes on
    the root element (e.g. a schemaLocation that survived namespace
    stripping) are preserved — a bare f-string dropped them."""

    tag = root.tag
    shell = ET.Element(tag, dict(root.attrib))
    kids = list(root)
    if not kids:
        return [to_string(shell)]
    long_form = ET.tostring(shell, encoding="unicode", short_empty_elements=False)
    open_tag = long_form[: -len(tag) - 3]  # strip the trailing </tag>
    parts = [to_string(k) for k in kids]
    parts[0] = open_tag + parts[0]
    parts[-1] = parts[-1] + f"</{tag}>"
    return parts


def update_corpus_df(
    corpus: DataFrame,
    meta: DataFrame,
    specs: dict | None = None,
    extra_fields: list[str] | None = None,
) -> DataFrame:
    """U1 in-place preservation as a Spark operator: corpus span rows joined
    with their (possibly modified) wide records; each document's ORIGINAL
    XML is patched and re-split into spans.  Unmanaged elements survive.

    Plan: one doc_id equi-join (records are the extraction output — same
    partitioning lineage), then a single Arrow pass.  Attributes are written
    from ``attributes_inline`` when present so a catalog-resolved view is
    not flattened into the local document (the catalog reference element is
    preserved instead, like the reference's untouched remote fetch).

    ``specs``/``extra_fields``: the same extension surface as
    extract_wide — custom X1/X2 properties named in ``extra_fields`` ride
    the join and are written by the overridden spec (the specs dict pickles
    into the Arrow closure, so callable write_fns run on executors)."""

    from gmx.convert import _REC_FIELDS, _to_plain
    from gmx.schema import CORPUS_SCHEMA

    rec_cols = ["standard"] + _REC_FIELDS + [
        c for c in (extra_fields or []) if c in meta.columns
    ]
    # left join: corpus rows without a record (e.g. catalog siblings, or a
    # selective update) pass through byte-identical
    joined = corpus.join(meta.select("doc_id", *rec_cols), "doc_id", "left")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "spans": []}
            recs = pdf.to_dict("records")
            for row in recs:
                if row["standard"] is None or (
                    isinstance(row["standard"], float) and pd.isna(row["standard"])
                ):
                    out["doc_id"].append(row["doc_id"])
                    out["spans"].append([dict(s) for s in row["spans"]])
                    continue
                rec = {k: _to_plain(v) for k, v in row.items() if k != "spans"}
                rec["attributes"] = rec.get("attributes_inline") or rec.get("attributes")
                spans = row["spans"]
                xml = "".join(
                    s["text"] for s in spans if s["kind"] == "text"
                )
                try:
                    root = parse_xml(xml)
                except BadContent:
                    # a record paired with unparseable spans (caller-built
                    # input): pass the document through untouched rather
                    # than killing the task
                    out["doc_id"].append(rec["doc_id"])
                    out["spans"].append([dict(s) for s in spans])
                    continue
                update_tree(root, rec, rec["standard"], specs)
                new_spans, offset = [], 0
                for sec in _sections(root):
                    new_spans.append(
                        {"kind": "text", "text": sec, "media_ref": "", "offset": offset}
                    )
                    offset += len(sec)
                for s in spans:
                    if s["kind"] == "media":
                        new_spans.append(
                            {"kind": "media", "text": "", "media_ref": s["media_ref"], "offset": offset}
                        )
                out["doc_id"].append(rec["doc_id"])
                out["spans"].append(new_spans)
            yield pd.DataFrame(out)

    return joined.mapInPandas(run, schema=CORPUS_SCHEMA)
