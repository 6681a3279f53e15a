"""README Quickstart executes verbatim — the public-API walkthrough is
a test, not a promise: every ```python fence in the Quickstart section
runs in order in one shared namespace (doctest-style), so a drifted
signature or a broken example fails CI, and the façade
(`import hydraide_spark as hs`) is exercised end-to-end."""

from __future__ import annotations

import os
import re

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def _quickstart_blocks() -> list[str]:
    text = open(README).read()
    start = text.index("## Quickstart")
    end = text.index("## Layout", start)
    section = text[start:end]
    return re.findall(r"```python\n(.*?)```", section, re.DOTALL)


def test_quickstart_blocks_exist():
    blocks = _quickstart_blocks()
    assert len(blocks) >= 9  # one per family


def test_quickstart_runs_verbatim(spark):
    ns: dict = {"spark": spark}
    for i, block in enumerate(_quickstart_blocks()):
        # the README builds its own session; the test reuses the shared
        # fixture so the suite stays one-JVM
        block = block.replace(
            'spark = hs.get_spark("quickstart")', "spark = spark"
        )
        try:
            exec(compile(block, f"README.md#quickstart[{i}]", "exec"), ns, ns)
        except Exception as e:  # name the failing block in the report
            raise AssertionError(
                f"README Quickstart block {i} failed: {e}\n---\n{block}"
            ) from e
