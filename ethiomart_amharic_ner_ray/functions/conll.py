"""CoNLL fixture reader/writer.

The reference carries four near-duplicate CoNLL readers (SURVEY.md §2.1 S8);
here there is exactly one, used only for golden-fixture tests — at scale
tokens/tags live as list<string> Parquet columns, never as CoNLL text.

Format (reference data_pipeline.py:138-167 / 190-211): one ``token<TAB>tag``
per line (delimiter auto-detected: tab if present in the first line, else
whitespace), blank line between sentences. The writer is atomic
(tmp + os.replace), mirroring the reference's transactional discipline.
"""

from __future__ import annotations

import os
import re
from pathlib import Path


def parse_conll(content: str) -> list[list[tuple[str, str]]]:
    first_line = content.split("\n")[0] if content else ""
    delimiter = "\t" if "\t" in first_line else r"\s+"
    sentences: list[list[tuple[str, str]]] = []
    current: list[tuple[str, str]] = []
    for line in content.split("\n"):
        line = line.strip()
        if not line:
            if current:
                sentences.append(current)
                current = []
            continue
        parts = re.split(delimiter, line, maxsplit=1)
        if len(parts) == 2:
            current.append((parts[0], parts[1]))
    if current:
        sentences.append(current)
    return sentences


def read_conll(path: str | Path) -> list[list[tuple[str, str]]]:
    return parse_conll(Path(path).read_text(encoding="utf-8"))


def write_conll(sentences: list[list[tuple[str, str]]], path: str | Path) -> None:
    path = Path(path)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        for sentence in sentences:
            for token, tag in sentence:
                f.write(f"{token}\t{tag}\n")
            f.write("\n")
    os.replace(tmp, path)
    if not path.exists():
        raise IOError(f"atomic CoNLL write failed: {path}")
