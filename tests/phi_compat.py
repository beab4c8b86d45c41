"""Import the reference's bundled TF-1.x-era PhiFlow under modern numpy.

The snapshot at /root/reference/phi predates numpy 1.24: it uses the removed
``np.float``-style aliases, ``collections.Iterable``, and (most intrusively)
list-of-slices indexing ``arr[[slice(None)] + slices]``, which new numpy
rejects ("only integers, slices, ... are valid indices"). Rather than pin an
old numpy (no network in this environment), this module installs:

  1. attribute shims for the removed numpy / collections aliases, and
  2. an AST-rewriting meta-path importer for ``phi.*`` that wraps every
     subscript index built out of ``slice(...)`` expressions (or variables
     named ``*slice*``) in ``tuple(...)`` — the exact semantics old numpy
     applied to list indices containing slices.

Only used by tests/test_fluids_golden.py to generate reference ("golden")
trajectories on the fly and compare them against diffphycon_tpu.physics.
"""

from __future__ import annotations

import ast
import collections
import collections.abc
import importlib.abc
import importlib.machinery
import importlib.util
import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")


def _install_alias_shims() -> None:
    for name, val in [("float", float), ("int", int), ("bool", bool),
                      ("object", object), ("complex", complex)]:
        if not hasattr(np, name):
            setattr(np, name, val)
    for name in ("Iterable", "Mapping", "MutableMapping", "Sequence",
                 "Callable", "Set", "Hashable", "Sized"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))


def _phi_idx(e):
    """Old-numpy list indexing semantics: a list index that contains slices
    (or None/Ellipsis) was treated as a tuple. Pure passthrough otherwise."""
    if isinstance(e, list) and any(
            isinstance(i, slice) or i is None or i is Ellipsis for i in e):
        return tuple(e)
    return e


class _SliceIndexTupler(ast.NodeTransformer):
    """Rewrite every ``x[e]`` (plain-expression index) into
    ``x[__phi_idx__(e)]``; the helper tuples list-of-slices at runtime and is
    the identity for every other index type, so semantics are otherwise
    untouched."""

    def visit_Subscript(self, node: ast.Subscript):
        self.generic_visit(node)
        idx = node.slice
        # a:b syntax and explicit tuples are already fine
        if isinstance(idx, (ast.Slice, ast.Tuple)):
            return node
        node.slice = ast.Call(
            func=ast.Name(id="__phi_idx__", ctx=ast.Load()),
            args=[idx], keywords=[])
        ast.fix_missing_locations(node)
        return node


class _PhiLoader(importlib.abc.SourceLoader):
    def __init__(self, fullname: str, path: str):
        self._name = fullname
        self._path = path

    def get_filename(self, fullname: str) -> str:
        return self._path

    def get_data(self, path: str) -> bytes:
        return Path(path).read_bytes()

    def source_to_code(self, data, path, *, _optimize=-1):
        tree = ast.parse(data, filename=path)
        tree = _SliceIndexTupler().visit(tree)
        ast.fix_missing_locations(tree)
        return compile(tree, path, "exec", optimize=_optimize)

    def exec_module(self, module):
        module.__dict__["__phi_idx__"] = _phi_idx
        super().exec_module(module)


class _PhiFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname != "phi" and not fullname.startswith("phi."):
            return None
        rel = fullname.replace(".", "/")
        pkg_init = REFERENCE / rel / "__init__.py"
        mod_file = REFERENCE / (rel + ".py")
        if pkg_init.is_file():
            spec = importlib.util.spec_from_file_location(
                fullname, pkg_init, loader=_PhiLoader(fullname, str(pkg_init)),
                submodule_search_locations=[str(REFERENCE / rel)])
            return spec
        if mod_file.is_file():
            return importlib.util.spec_from_file_location(
                fullname, mod_file, loader=_PhiLoader(fullname, str(mod_file)))
        return None


_installed = False


def install() -> bool:
    """Install shims + importer. Returns False when the reference is absent."""
    global _installed
    if not REFERENCE.exists():
        return False
    _install_alias_shims()
    if not _installed:
        sys.meta_path.insert(0, _PhiFinder())
        _installed = True
    return True
