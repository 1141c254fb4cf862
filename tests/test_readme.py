"""Execute the README example block, mirroring the reference's
sybil-doctest harness (reference: conftest.py:1-28 runs README.md:116-125
and pins uscat(0) = -0.741333-0.669657j)."""

import os
import re

import numpy as np


def test_readme_example_runs_and_matches():
    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    text = open(readme).read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert blocks, "README has no python example block"
    src = blocks[0]
    ns = {}
    exec(compile(src, "README.md", "exec"), ns)  # noqa: S102
    u0 = ns["u0"].to_numpy()[0]
    np.testing.assert_allclose(
        complex(u0), -0.741333 - 0.669657j, atol=2e-6
    )
