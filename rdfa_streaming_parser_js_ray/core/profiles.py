"""RDFa profiles and feature flags.

Mirrors the feature matrix of the reference
(/root/reference/lib/RdfaProfile.ts:15-161): five profiles
('', 'core', 'html', 'xhtml', 'xml'), thirteen boolean features, and a
content-type → profile table.  Represented as a frozen dataclass so a
profile/feature config is hashable and cheap to ship in task closures.
"""

from __future__ import annotations

from dataclasses import dataclass, fields, replace


@dataclass(frozen=True)
class RdfaFeatures:
    base_tag: bool = False
    xml_base: bool = False
    lang_attribute: bool = False
    only_allow_uri_rel_rev_if_property: bool = False
    inherit_subject_in_head_body: bool = False
    datetime_attribute: bool = False
    time_tag: bool = False
    html_datatype: bool = False
    copy_rdfa_patterns: bool = False
    xmlns_prefix_mappings: bool = False
    skip_handling_xml_literal_children: bool = False
    xhtml_initial_context: bool = False
    role_attribute: bool = False

    def with_overrides(self, **kwargs: bool) -> "RdfaFeatures":
        return replace(self, **kwargs)


# JS-style camelCase names (the reference's option keys) → our field names,
# so fixture files can carry feature overrides verbatim.
_CAMEL_TO_FIELD = {
    "baseTag": "base_tag",
    "xmlBase": "xml_base",
    "langAttribute": "lang_attribute",
    "onlyAllowUriRelRevIfProperty": "only_allow_uri_rel_rev_if_property",
    "inheritSubjectInHeadBody": "inherit_subject_in_head_body",
    "datetimeAttribute": "datetime_attribute",
    "timeTag": "time_tag",
    "htmlDatatype": "html_datatype",
    "copyRdfaPatterns": "copy_rdfa_patterns",
    "xmlnsPrefixMappings": "xmlns_prefix_mappings",
    "skipHandlingXmlLiteralChildren": "skip_handling_xml_literal_children",
    "xhtmlInitialContext": "xhtml_initial_context",
    "roleAttribute": "role_attribute",
}


def features_from_dict(d: dict) -> RdfaFeatures:
    """Build a feature set from a (possibly camelCase) dict.

    An explicit features dict REPLACES the profile defaults entirely
    (reference semantics: ``options.features || RDFA_FEATURES[profile]``,
    RdfaParser.ts:39) — absent keys are disabled.
    """
    kwargs = {}
    valid = {f.name for f in fields(RdfaFeatures)}
    for k, v in d.items():
        field = _CAMEL_TO_FIELD.get(k, k)
        if field in valid:
            kwargs[field] = bool(v)
    return RdfaFeatures(**kwargs)


RDFA_FEATURES: dict[str, RdfaFeatures] = {
    "": RdfaFeatures(
        base_tag=True, xml_base=True, lang_attribute=True,
        only_allow_uri_rel_rev_if_property=True, inherit_subject_in_head_body=True,
        datetime_attribute=True, time_tag=True, html_datatype=True,
        copy_rdfa_patterns=True, xmlns_prefix_mappings=True,
        xhtml_initial_context=True, role_attribute=True,
    ),
    "core": RdfaFeatures(
        lang_attribute=True, only_allow_uri_rel_rev_if_property=True,
        copy_rdfa_patterns=True, xmlns_prefix_mappings=True,
    ),
    "html": RdfaFeatures(
        base_tag=True, lang_attribute=True,
        only_allow_uri_rel_rev_if_property=True, inherit_subject_in_head_body=True,
        datetime_attribute=True, time_tag=True, html_datatype=True,
        copy_rdfa_patterns=True, xmlns_prefix_mappings=True, role_attribute=True,
    ),
    "xhtml": RdfaFeatures(
        base_tag=True, lang_attribute=True,
        only_allow_uri_rel_rev_if_property=True, inherit_subject_in_head_body=True,
        datetime_attribute=True, time_tag=True, html_datatype=True,
        copy_rdfa_patterns=True, xmlns_prefix_mappings=True,
        xhtml_initial_context=True, role_attribute=True,
    ),
    "xml": RdfaFeatures(
        xml_base=True, lang_attribute=True, datetime_attribute=True,
        time_tag=True, xmlns_prefix_mappings=True, role_attribute=True,
    ),
}

RDFA_CONTENTTYPES: dict[str, str] = {
    "text/html": "html",
    "application/xhtml+xml": "xhtml",
    "application/xml": "xml",
    "text/xml": "xml",
    "image/svg+xml": "xml",
}


def content_type_to_profile(content_type: str) -> str:
    return RDFA_CONTENTTYPES.get(content_type, "")
