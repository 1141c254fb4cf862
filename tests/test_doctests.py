"""Doctest harness over the whole package + markdown docs.

Mirrors the reference's sybil configuration (reference conftest.py:1-28:
doctests collected from ALL *.py and *.md files with the NUMBER flag).
Here: stdlib doctest over every module in biem_helmholtz_sphere_tpu, and
every ```python block in README.md and docs/*.md executed (blocks in
retrieved-content files like PAPERS.md/SNIPPETS.md are deliberately NOT
executed).
"""

import doctest
import glob
import importlib
import os
import pkgutil
import re

import pytest

import biem_helmholtz_sphere_tpu as pkg

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _iter_modules():
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        yield info.name


MODULES = sorted(_iter_modules())


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    mod = importlib.import_module(modname)
    finder = doctest.DocTestFinder(exclude_empty=True)
    runner = doctest.DocTestRunner(
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS
    )
    tests = finder.find(mod, name=modname)
    ran = 0
    for t in tests:
        if not t.examples:
            continue
        result = runner.run(t)
        assert result.failed == 0, f"{t.name}: {result.failed} doctest failures"
        ran += result.attempted
    # modules without examples are fine — but the public entry points
    # must keep theirs (checked in test_public_api_has_examples)


def test_public_api_has_examples():
    """The flagship public functions carry executable examples, like the
    reference's docstrings (checked so they aren't silently dropped)."""
    from biem_helmholtz_sphere_tpu import (
        biem,
        max_memory,
        max_n_end,
        plane_wave,
        point_source,
    )
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    from biem_helmholtz_sphere_tpu.harmonics import harm_n_ndim_le

    for fn in (
        biem,
        plane_wave,
        point_source,
        max_memory,
        max_n_end,
        create_from_branching_types,
        harm_n_ndim_le,
    ):
        assert ">>>" in (fn.__doc__ or ""), f"{fn.__name__} lost its doctest"


def _md_python_blocks():
    files = [os.path.join(_ROOT, "README.md")] + sorted(
        glob.glob(os.path.join(_ROOT, "docs", "*.md"))
    )
    out = []
    for path in files:
        text = open(path).read()
        for i, block in enumerate(re.findall(r"```python\n(.*?)```", text, re.S)):
            out.append((os.path.basename(path), i, block))
    return out


@pytest.mark.parametrize(
    "fname,idx,src",
    _md_python_blocks(),
    ids=[f"{f}#{i}" for f, i, _ in _md_python_blocks()],
)
def test_markdown_blocks_execute(fname, idx, src):
    ns = {}
    exec(compile(src, f"{fname}#{idx}", "exec"), ns)  # noqa: S102
