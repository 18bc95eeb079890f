"""ski hierarchy writer: regenerate parameters XML with defaults resolved.

Counterpart of the reference's XmlHierarchyWriter (ref: SMILE/serialize/
XmlHierarchyWriter.hpp — walks the live item hierarchy and writes every
property, materializing values the user left at their defaults;
SkirtCommandLineHandler.cpp:342-347 writes `<prefix>_parameters.xml` next to
the outputs). Here the regeneration walks the parsed element tree and
materializes the defaults the engine actually applied (the loader's own
default table), so the emitted file is a complete, reloadable record of the
run configuration rather than an echo of the input text.

Also provides a small programmatic builder API (`item`, `write_ski`) so a
ski file can be authored from Python without hand-writing XML — the
replacement for authoring flows that used the reference's smile schema.
"""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET


from . import schema as _schema


def _materialize_defaults(el: ET.Element):
    # single source of truth: the declarative item registry with
    # conditional relevance (config/schema.py; ref: NameManager +
    # ATTRIBUTE_DEFAULT_VALUE/RELEVANT_IF declarations)
    _schema.materialize(el)


def _indent(el: ET.Element, depth: int = 0):
    pad = "\n" + "    " * (depth + 1)
    if len(el):
        if not (el.text or "").strip():
            el.text = pad
        for c in el:
            _indent(c, depth + 1)
            if not (c.tail or "").strip():
                c.tail = pad
        if not (el[-1].tail or "").strip():
            el[-1].tail = "\n" + "    " * depth


def regenerate(ski_text: str, producer: str = "skirt9_tpu") -> str:
    """Parse a ski document and regenerate it: defaults materialized,
    producer/time stamped, canonical indentation — a reloadable record of
    the configuration as the engine interpreted it
    (ref: XmlHierarchyWriter output contract)."""
    root = ET.fromstring(ski_text)
    root.attrib["producer"] = producer
    root.attrib["time"] = datetime.datetime.now().strftime(
        "%Y-%m-%dT%H:%M:%S")
    _materialize_defaults(root)
    _indent(root)
    body = ET.tostring(root, encoding="unicode")
    return "<?xml version='1.0' encoding='UTF-8'?>\n" + body + "\n"


# ---------------------------------------------------------------- builder


def item(tag: str, attrs: dict | None = None, **children) -> ET.Element:
    """Build a ski item element; keyword args are property names mapped to
    child items (single element or list): the SMILE 'item property'
    pattern <property type="..."><ConcreteItem .../></property>."""
    el = ET.Element(tag)
    if attrs:
        el.attrib.update({k: str(v) for k, v in attrs.items()})
    for prop, sub in children.items():
        wrap = ET.SubElement(el, prop, {"type": "_"})
        subs = sub if isinstance(sub, (list, tuple)) else [sub]
        for s in subs:
            wrap.append(s)
        wrap.attrib["type"] = subs[0].tag if subs else "_"
    return el


def write_ski(mcs: ET.Element, path: str):
    """Wrap a MonteCarloSimulation item in the standard document envelope
    and write it (API ski authoring)."""
    root = ET.Element("skirt-simulation-hierarchy",
                      {"type": "MonteCarloSimulation", "format": "9",
                       "producer": "skirt9_tpu"})
    root.append(mcs)
    _indent(root)
    with open(path, "w", encoding="utf-8") as f:
        f.write("<?xml version='1.0' encoding='UTF-8'?>\n")
        f.write(ET.tostring(root, encoding="unicode"))
        f.write("\n")
