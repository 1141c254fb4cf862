# Sphinx configuration (parity with the reference's readthedocs setup,
# /root/reference/docs/conf.py).  The docs are plain Markdown and fully
# readable without building; with `sphinx` + `myst-parser` installed,
# `sphinx-build -b html docs docs/_build` renders them.
project = "biem-helmholtz-sphere-tpu"
author = "biem-helmholtz-sphere-tpu developers"
extensions = ["myst_parser"]
source_suffix = {".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
