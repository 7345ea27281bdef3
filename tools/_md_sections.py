"""Shared markdown section splice for the scale probes.

Every probe owns one ``## <title>`` section of SCALING.md and must
replace it IN PLACE on rerun — append-only leaves duplicate sections
behind, and remove-then-append reorders the document. This helper was
extracted after the same splice block had been copy-pasted into five
probes (ann_drift, lake_scale, media_scale, search_index_scale,
tpch_scale); fix splice bugs here, once.
"""

from __future__ import annotations

import os


def replace_section(
    path: str,
    marker: str,
    section: str,
    insert_before: str | None = None,
) -> None:
    """Replace the section starting at ``marker`` (a ``"\\n## ..."``
    heading prefix) and running to the next ``"\\n## "`` heading (or
    EOF) with ``section`` (which must start with the full heading),
    preserving document order. Legacy duplicate occurrences of the
    marker are dropped. If the section doesn't exist yet it is
    inserted before ``insert_before`` (a heading prefix) when given
    and present, else appended. Creates ``path`` if missing."""
    content = ""
    if os.path.exists(path):
        with open(path) as f:
            content = f.read()
    section = section.rstrip("\n") + "\n"
    if marker in content:
        start = content.index(marker)
        nxt = content.find("\n## ", start + len(marker))
        tail = content[nxt:] if nxt != -1 else ""
        content = content[:start] + section + tail
        # drop any legacy duplicates left behind by append-only eras
        dup = content.find(marker, start + len(section))
        while dup != -1:
            nxt = content.find("\n## ", dup + len(marker))
            content = content[:dup] + (content[nxt:] if nxt != -1 else "")
            dup = content.find(marker, dup)
    elif insert_before is not None and insert_before in content:
        at = content.index(insert_before)
        content = content[:at] + section + content[at:]
    else:
        content = content + section
    with open(path, "w") as f:
        f.write(content)
