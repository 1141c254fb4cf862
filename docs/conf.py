# Sphinx configuration (parity with the reference's readthedocs setup,
# /root/reference/docs/conf.py).  The docs are plain Markdown and fully
# readable without building; with `sphinx` + `myst-parser` installed,
# `sphinx-build -b html docs docs/_build` renders them (the CI docs job
# does exactly this, including the autodoc API page apidoc.md).
project = "biem-helmholtz-sphere-tpu"
author = "biem-helmholtz-sphere-tpu developers"
extensions = [
    "myst_parser",
    "sphinx.ext.autodoc",
    "sphinx.ext.viewcode",
]
source_suffix = {".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
# autodoc imports the package; jax/numpy/scipy are installed in the CI
# docs job.  Keep member order as written in the source.
autodoc_member_order = "bysource"
autodoc_typehints = "description"
