"""Schema harvest: derive per-type property lists from the builders.

The loader (config/ski.py) is a set of builder functions dispatching on
item type names and reading unit-bearing attributes through `_q`, plain
floats through `_f`, raw attributes through `attrs.get`/`attrs[...]`, and
child items through `_child(el, "name")`. That code IS the schema — this
module walks its AST once and extracts, for every accepted type name, the
properties the builder actually consumes: name, unit quantity (for `_q`),
default value, and whether a child item is expected.

This is the mechanical counterpart of the reference's compile-time ITEM
macro DSL (ref: SMILE/schema/ItemInfo.hpp:168 PROPERTY_* macros feeding
SchemaDef, SchemaDef.hpp:22): there the schema is declared next to the
code; here it is derived FROM the code, so it can never drift from what
the loader accepts.
"""

from __future__ import annotations

import ast
import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class HProp:
    name: str
    kind: str            # "quantity" | "double" | "string" | "item"
    quantity: str | None = None
    default: str | None = None
    required: bool = False


def _const_str(node):
    return node.value if isinstance(node, ast.Constant) \
        and isinstance(node.value, str) else None


def _type_names_from_test(test) -> list[str]:
    """['TypeName', ...] when an `if` test dispatches on an item tag."""

    def is_tag_expr(n):
        if isinstance(n, ast.Name) and n.id in ("t", "ft", "mt", "kind"):
            return n.id in ("t", "ft")
        return (isinstance(n, ast.Attribute) and n.attr == "tag")

    out = []
    if isinstance(test, ast.Compare) and len(test.ops) == 1:
        left, op, right = test.left, test.ops[0], test.comparators[0]
        if is_tag_expr(left) and isinstance(op, ast.Eq):
            s = _const_str(right)
            if s and s[:1].isupper():
                out.append(s)
        elif is_tag_expr(left) and isinstance(op, ast.In) \
                and isinstance(right, (ast.Tuple, ast.List)):
            for e in right.elts:
                s = _const_str(e)
                if s and s[:1].isupper():
                    out.append(s)
    elif isinstance(test, ast.BoolOp) and isinstance(test.op, ast.Or):
        for v in test.values:
            out.extend(_type_names_from_test(v))
    return out


class _Harvester(ast.NodeVisitor):
    def __init__(self):
        self.types: dict[str, dict[str, HProp]] = {}
        self._stack: list[list[str]] = []

    # -------------------------------------------------------------- helpers
    def _add(self, prop: HProp):
        for frame in self._stack[::-1]:
            if frame:
                for tname in frame:
                    self.types.setdefault(tname, {})
                    # first sighting wins (the branch-local read is the
                    # most specific)
                    self.types[tname].setdefault(prop.name, prop)
                return

    def _current(self) -> bool:
        return any(self._stack)

    # ---------------------------------------------------------------- visits
    def visit_FunctionDef(self, node: ast.FunctionDef):
        # builder functions dispatch on a tag within their body: attribute
        # reads OUTSIDE any type branch (shared prologue like filename /
        # importMetallicity) apply to EVERY type the function accepts
        shared = sorted({n for ch in ast.walk(node)
                         if isinstance(ch, ast.If)
                         for n in _type_names_from_test(ch.test)})
        self._stack.append(shared)
        for ch in node.body:
            self.visit(ch)
        self._stack.pop()

    def visit_If(self, node: ast.If):
        # reads inside the TEST itself belong to the enclosing branch
        self.visit(node.test)
        names = _type_names_from_test(node.test)
        self._stack.append(names)
        for ch in node.body:
            self.visit(ch)
        self._stack.pop()
        self._stack.append([])
        for ch in node.orelse:
            self.visit(ch)
        self._stack.pop()

    def visit_Call(self, node: ast.Call):
        fn = node.func
        fname = fn.id if isinstance(fn, ast.Name) else (
            fn.attr if isinstance(fn, ast.Attribute) else None)
        if fname == "_q" and len(node.args) >= 3:
            name = _const_str(node.args[1])
            qty = _const_str(node.args[2])
            default = None
            required = len(node.args) < 4
            if len(node.args) >= 4 and isinstance(node.args[3],
                                                  ast.Constant):
                default = repr(node.args[3].value)
            if name:
                self._add(HProp(name, "quantity", qty, default, required))
        elif fname == "_f" and len(node.args) >= 2:
            name = _const_str(node.args[1])
            default = None
            required = len(node.args) < 3
            if len(node.args) >= 3 and isinstance(node.args[2],
                                                  ast.Constant):
                default = repr(node.args[2].value)
            if name:
                self._add(HProp(name, "double", None, default, required))
        elif fname == "get" and isinstance(fn, ast.Attribute) \
                and node.args:
            name = _const_str(node.args[0])
            default = None
            if len(node.args) >= 2 and isinstance(node.args[1],
                                                  ast.Constant):
                default = repr(node.args[1].value)
            if name and name[:1].islower():
                self._add(HProp(name, "string", None, default, False))
        elif fname == "_child" and len(node.args) >= 2:
            name = _const_str(node.args[1])
            if name and name[:1].islower():
                self._add(HProp(name, "item", None, None, False))
        self.generic_visit(node)

    def visit_Subscript(self, node: ast.Subscript):
        # attrs["name"] — a required raw attribute
        if isinstance(node.slice, ast.Constant) \
                and isinstance(node.slice.value, str):
            name = node.slice.value
            base = node.value
            if name[:1].islower() and isinstance(base, ast.Name) \
                    and base.id in ("a", "attrs", "ba", "ra", "ia", "la",
                                    "pa", "ca", "pa2", "ia_"):
                self._add(HProp(name, "string", None, None, True))
        self.generic_visit(node)


def harvest(extra_modules: tuple = ()) -> dict[str, dict[str, HProp]]:
    """Per-type property dicts harvested from the loader source."""
    here = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.dirname(here)
    files = [os.path.join(here, "ski.py"),
             os.path.join(pkg, "spectral", "wdists.py"),
             os.path.join(pkg, "grids", "meshes.py"),
             os.path.join(pkg, "utils", "cosmology.py")] \
        + list(extra_modules)
    h = _Harvester()
    for f in files:
        with open(f) as fh:
            tree = ast.parse(fh.read())
        h.visit(tree)
    _family_post(h.types)
    return h.types


def _family_post(types: dict):
    """Dict-dispatched item families share a generic reader: attach the
    properties that reader consumes (probes: probeName/probeAfter +
    optional wavelength, config/ski.py probe loop; named resource SEDs /
    bands / mean mixes: their generic loaders)."""
    from .schema import supported_type_names

    probe_props = {
        "probeName": HProp("probeName", "string", None, None, False),
        "probeAfter": HProp("probeAfter", "string", None, None, False),
        "wavelength": HProp("wavelength", "quantity", "wavelength", None,
                            False),
    }
    mesh_props = {"numBins": HProp("numBins", "double", None, "16", False)}
    for n in supported_type_names():
        d = types.setdefault(n, {})
        if n.endswith("Probe"):
            for k, v in probe_props.items():
                d.setdefault(k, v)
        elif n.endswith("Mesh") and not n.endswith(("SpatialGrid",)):
            for k, v in mesh_props.items():
                d.setdefault(k, v)
