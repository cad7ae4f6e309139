"""Dictionary source handling: field specs and line parsing.

The reference declares dictionary schemas with a caller-supplied ``fields``
list (utility.py:51-81; README.md:141-169): exactly one column carries the
entity ID (``id_flag``), one the synonym text (``value_flag``), optionally
one a normalizer tag (``normalizer_flag``); any column may hold a delimited
value list. This module keeps those semantics but as typed dataclasses, and
parses rows into a flat relational shape (one record per line) that both the
driver-side compiler and the Spark DataFrame loader consume.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class FieldSpec:
    name: str
    include: bool = True
    delimiter: Optional[str] = None
    id_flag: bool = False
    normalizer_flag: bool = False
    value_flag: bool = False


@dataclass(frozen=True)
class DictSpecs:
    """Compiled column roles: positional index per role + included columns.

    Equivalent content to the reference's specs dict (utility.py:51-81):
    ``fields[name] = (index, delimiter, normalizer_flag, value_flag)``.
    """

    fields: Dict[str, Tuple[int, Optional[str], bool, bool]]
    id_index: int
    value_index: int
    tokenizer_index: Optional[int]


def compile_specs(fields: Sequence[FieldSpec]) -> DictSpecs:
    out: Dict[str, Tuple[int, Optional[str], bool, bool]] = {}
    id_index = value_index = -1
    tokenizer_index: Optional[int] = None
    for i, f in enumerate(fields):
        if not f.include:
            continue
        out[f.name] = (i, f.delimiter, f.normalizer_flag, f.value_flag)
        if f.id_flag:
            id_index = i
        if f.normalizer_flag:
            tokenizer_index = i
        if f.value_flag:
            value_index = i
    if id_index < 0 or value_index < 0:
        raise ValueError("fields must mark exactly one id_flag and one value_flag column")
    return DictSpecs(fields=out, id_index=id_index, value_index=value_index, tokenizer_index=tokenizer_index)


def fields_from_dicts(fields: Sequence[dict]) -> List[FieldSpec]:
    """Accept the reference's plain-dict field declarations verbatim."""
    return [
        FieldSpec(
            name=f["name"],
            include=bool(f.get("include", True)),
            delimiter=f.get("delimiter"),
            id_flag=bool(f.get("id_flag", False)),
            normalizer_flag=bool(f.get("normalizer_flag", False)),
            value_flag=bool(f.get("value_flag", False)),
        )
        for f in fields
    ]


def parse_dictionary_line(
    line: str, column_separator: str = "\t", column_enclosure: str = ""
) -> List[str]:
    """Split one dictionary row into trimmed cells (model.py:322)."""
    cells = line.rstrip("\n").split(column_separator)
    if column_enclosure:
        cells = [c.strip(column_enclosure) for c in cells]
    return cells


@dataclass(frozen=True)
class DictRow:
    """One (line, entity, synonym) record with its attribute cells."""

    line_number: int
    entity_id: str
    synonym: str
    normalizer_tag: Optional[str]
    # attr name -> list of values (delimited cells already exploded+deduped)
    attrs: Dict[str, List[str]]


def rows_from_lines(
    lines: Sequence[str],
    specs: DictSpecs,
    column_separator: str = "\t",
    column_enclosure: str = "",
) -> List[DictRow]:
    """Parse raw dictionary lines into DictRow records.

    Attribute columns follow the reference's melt semantics
    (model.py:299-305): every included column except the synonym column is an
    attribute (the id and normalizer-tag columns included); delimited cells
    are split and de-duplicated. Values are sorted for determinism — the
    reference iterates a Python set here, which is hash-order dependent.
    """
    out: List[DictRow] = []
    for n, line in enumerate(lines):
        cells = parse_dictionary_line(line, column_separator, column_enclosure)
        attrs: Dict[str, List[str]] = {}
        for name, (idx, delim, _nflag, vflag) in specs.fields.items():
            if vflag:
                continue
            cell = cells[idx]
            if delim:
                attrs[name] = sorted(set(cell.split(delim)))
            else:
                attrs[name] = [cell]
        tag = cells[specs.tokenizer_index] if specs.tokenizer_index is not None else None
        out.append(
            DictRow(
                line_number=n,
                entity_id=cells[specs.id_index],
                synonym=cells[specs.value_index],
                normalizer_tag=tag,
                attrs=attrs,
            )
        )
    return out


def assign_internal_ids(rows: Sequence[DictRow]) -> Dict[int, int]:
    """Dense internal entity ids in first-seen order of entity_id values
    (model.py:324-330). Returns line_number -> internal_id."""
    seen: Dict[str, int] = {}
    line_iid: Dict[int, int] = {}
    for row in rows:
        iid = seen.setdefault(row.entity_id, len(seen))
        line_iid[row.line_number] = iid
    return line_iid
