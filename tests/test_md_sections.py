"""tools/_md_sections.replace_section — the shared SCALING.md splice
every scale probe writes through (extracted after five copy-pastes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._md_sections import replace_section  # noqa: E402

DOC = """# Title

intro

## Alpha

alpha body

## Beta

beta body

## Gamma

gamma body
"""


def _write(tmp_path, content=DOC):
    p = str(tmp_path / "doc.md")
    with open(p, "w") as f:
        f.write(content)
    return p


def test_replace_in_place_preserves_order(tmp_path):
    p = _write(tmp_path)
    replace_section(p, "\n## Beta", "\n## Beta v2\n\nnew beta\n")
    s = open(p).read()
    assert "beta body" not in s and "new beta" in s
    assert s.index("## Alpha") < s.index("## Beta v2") < s.index("## Gamma")


def test_missing_section_appends(tmp_path):
    p = _write(tmp_path)
    replace_section(p, "\n## Delta", "\n## Delta\n\nd\n")
    s = open(p).read()
    assert s.rstrip().endswith("d")
    assert s.index("## Gamma") < s.index("## Delta")


def test_insert_before_places_section(tmp_path):
    p = _write(tmp_path)
    replace_section(
        p, "\n## Delta", "\n## Delta\n\nd\n", insert_before="\n## Gamma"
    )
    s = open(p).read()
    assert s.index("## Beta") < s.index("## Delta") < s.index("## Gamma")


def test_legacy_duplicates_are_dropped(tmp_path):
    p = _write(tmp_path, DOC + "\n## Beta\n\nstale duplicate\n")
    replace_section(p, "\n## Beta", "\n## Beta\n\nonly one\n")
    s = open(p).read()
    assert s.count("## Beta") == 1
    assert "stale duplicate" not in s and "only one" in s


def test_last_section_replacement_keeps_eof_clean(tmp_path):
    p = _write(tmp_path)
    replace_section(p, "\n## Gamma", "\n## Gamma\n\ng2\n")
    s = open(p).read()
    assert s.endswith("g2\n") and "gamma body" not in s


def test_creates_missing_file(tmp_path):
    p = str(tmp_path / "fresh.md")
    replace_section(p, "\n## Solo", "\n## Solo\n\ns\n")
    assert "## Solo" in open(p).read()


def test_idempotent_rerun(tmp_path):
    p = _write(tmp_path)
    sec = "\n## Beta\n\nsame body\n"
    replace_section(p, "\n## Beta", sec)
    once = open(p).read()
    replace_section(p, "\n## Beta", sec)
    assert open(p).read() == once
