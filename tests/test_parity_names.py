"""Mechanical name-parity scan: every public top-level function/class in
every reference module must resolve from the identically-named
``orphics_tpu`` module (the facade layer mirrors the reference layout;
implementations live in models/ ops/ parallel/ utils/).

Skips when the read-only reference checkout is not present.
"""
import ast
import importlib
import os

import pytest

REF = "/root/reference/orphics"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")


def _ref_modules():
    if not os.path.isdir(REF):
        return []
    return sorted(f[:-3] for f in os.listdir(REF)
                  if f.endswith(".py") and not f.startswith("_"))


@pytest.mark.parametrize("modname", _ref_modules())
def test_every_reference_public_name_resolves(modname):
    tree = ast.parse(open(os.path.join(REF, modname + ".py")).read())
    pub = [n.name for n in tree.body
           if isinstance(n, (ast.FunctionDef, ast.ClassDef))
           and not n.name.startswith("_")]
    ours = importlib.import_module("orphics_tpu." + modname)
    missing = [n for n in pub if not hasattr(ours, n)]
    assert not missing, (
        f"orphics_tpu.{modname} is missing reference public names: "
        f"{missing}")
