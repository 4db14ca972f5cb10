from gmx.specs.arcgis import ARCGIS, ARCGIS_NODES
from gmx.specs.fgdc import FGDC
from gmx.specs.iso import CATALOG_ROOT, ISO
from gmx.specs.model import (
    COMPLEX_FIELDS,
    COMPLEX_LIST_PROPS,
    COMPLEX_STRUCT_PROPS,
    ISO_CONTENT_DELIM,
    KEYWORD_PROPS,
    MULTI_SUBS,
    SIMPLE_PROPS,
    SUPPORTED_PROPS,
)

SPECS = {"fgdc": FGDC, "iso": ISO, "arcgis": ARCGIS}

__all__ = [
    "ARCGIS", "ARCGIS_NODES", "CATALOG_ROOT", "COMPLEX_FIELDS",
    "COMPLEX_LIST_PROPS", "COMPLEX_STRUCT_PROPS", "FGDC", "ISO",
    "ISO_CONTENT_DELIM", "KEYWORD_PROPS", "MULTI_SUBS", "SIMPLE_PROPS",
    "SPECS", "SUPPORTED_PROPS",
]
