"""Secondary-location fallback chains across the three standards — the
tree-surgery test family (SURVEY §5.5), one test per alternate the reference
data maps declare."""

from __future__ import annotations

from gmx.extract import extract_record


def test_iso_dist_country_country_tag():
    """country/CharacterString primary, country/Country secondary
    (iso_metadata_parser.py:132-133)."""

    xml = (
        "<MD_Metadata><distributionInfo><MD_Distribution><distributor>"
        "<MD_Distributor><distributorContact><CI_ResponsibleParty>"
        "<contactInfo><CI_Contact><address><CI_Address>"
        "<country><Country>Freedonia</Country></country>"
        "</CI_Address></address></CI_Contact></contactInfo>"
        "</CI_ResponsibleParty></distributorContact></MD_Distributor>"
        "</distributor></MD_Distribution></distributionInfo></MD_Metadata>"
    )
    assert extract_record(xml)["dist_country"] == "Freedonia"


def test_iso_dist_address_type_attribute():
    """dist_address_type reads the @type attribute (iso:127)."""

    xml = (
        "<MD_Metadata><distributionInfo><MD_Distribution><distributor>"
        "<MD_Distributor><distributorContact><CI_ResponsibleParty>"
        "<contactInfo><CI_Contact>"
        '<address type="postal"><CI_Address/></address>'
        "</CI_Contact></contactInfo></CI_ResponsibleParty>"
        "</distributorContact></MD_Distributor></distributor>"
        "</MD_Distribution></distributionInfo></MD_Metadata>"
    )
    assert extract_record(xml)["dist_address_type"] == "postal"


def test_arcgis_online_linkages_fallback():
    """citRespParty linkage primary, citOnlineRes secondary (arcgis:50-51)."""

    xml = (
        "<metadata><dataIdInfo><idCitation>"
        "<citOnlineRes><linkage>https://fallback.example</linkage></citOnlineRes>"
        "</idCitation></dataIdInfo></metadata>"
    )
    assert extract_record(xml)["online_linkages"] == "https://fallback.example"
    # primary wins when both exist
    xml2 = (
        "<metadata><dataIdInfo><idCitation>"
        "<citRespParty><rpCntInfo><cntOnlineRes>"
        "<linkage>https://primary.example</linkage>"
        "</cntOnlineRes></rpCntInfo></citRespParty>"
        "<citOnlineRes><linkage>https://fallback.example</linkage></citOnlineRes>"
        "</idCitation></dataIdInfo></metadata>"
    )
    assert extract_record(xml2)["online_linkages"] == "https://primary.example"


def test_arcgis_use_constraints_legconsts_fallback():
    """Consts/useLimit primary, LegConsts/useLimit secondary (arcgis:85-86)."""

    xml = (
        "<metadata><dataIdInfo><resConst><LegConsts>"
        "<useLimit>internal use</useLimit></LegConsts></resConst>"
        "</dataIdInfo></metadata>"
    )
    assert extract_record(xml)["use_constraints"] == "internal use"


def test_arcgis_dist_phone_bare_voicenum_fallback():
    """cntPhone/voiceNum primary, bare rpCntInfo/voiceNum secondary
    (arcgis:64-65)."""

    xml = (
        "<metadata><dataIdInfo/><distInfo><distributor><distorCont>"
        "<rpCntInfo><voiceNum>555-9999</voiceNum></rpCntInfo>"
        "</distorCont></distributor></distInfo></metadata>"
    )
    assert extract_record(xml)["dist_phone"] == "555-9999"


def test_fgdc_dist_contact_cntorgp_fallback():
    """dist contact person/org fall back cntperp -> cntorgp (fgdc:61-64)."""

    xml = (
        "<metadata><idinfo/><distinfo><distrib><cntinfo><cntorgp>"
        "<cntorg>Acme Dist</cntorg><cntper>Pat</cntper>"
        "</cntorgp></cntinfo></distrib></distinfo></metadata>"
    )
    rec = extract_record(xml)
    assert rec["dist_contact_org"] == "Acme Dist"
    assert rec["dist_contact_person"] == "Pat"


def test_iso_keyword_type_case_insensitive():
    """Keyword group type codes match case-insensitively (iso:456)."""

    xml = (
        "<MD_Metadata><identificationInfo><MD_DataIdentification>"
        "<descriptiveKeywords><MD_Keywords>"
        "<keyword><CharacterString>Lisbon</CharacterString></keyword>"
        "<type><MD_KeywordTypeCode>PLACE</MD_KeywordTypeCode></type>"
        "</MD_Keywords></descriptiveKeywords>"
        "</MD_DataIdentification></identificationInfo></MD_Metadata>"
    )
    assert extract_record(xml)["place_keywords"] == ["Lisbon"]


def test_iso_raster_dims_codelist_attribute_fallback():
    """dimensionName text primary, @codeListValue secondary (iso:306-307)."""

    xml = (
        "<MD_Metadata><spatialRepresentationInfo><MD_GridSpatialRepresentation>"
        "<numberOfDimensions><Integer>2</Integer></numberOfDimensions>"
        "<axisDimensionProperties><MD_Dimension>"
        '<dimensionName><MD_DimensionNameTypeCode codeListValue="row"/></dimensionName>'
        "<dimensionSize><Integer>512</Integer></dimensionSize>"
        "</MD_Dimension></axisDimensionProperties>"
        "</MD_GridSpatialRepresentation></spatialRepresentationInfo></MD_Metadata>"
    )
    info = extract_record(xml)["raster_info"]
    assert info["row_count"] == "512"
    assert info["dimensions"] == "2"


def test_arcgis_extra_keyword_kinds():
    xml = (
        "<metadata><dataIdInfo>"
        "<discKeys><keyword>geology</keyword></discKeys>"
        "<searchKeys><keyword>rocks</keyword><keyword>minerals</keyword></searchKeys>"
        "</dataIdInfo></metadata>"
    )
    rec = extract_record(xml)
    assert rec["discipline_keywords"] == ["geology"]
    assert rec["search_keywords"] == ["rocks", "minerals"]
    assert rec["product_keywords"] == []
