"""mdtraj-style atom-selection mini-language → SQL predicate.

The reference stack's selection language is mdtraj's
``topology.select`` (public docs: "Atom Selection Language" —
e.g. ``"name CA and resid 1 to 10"``); reference users reach it
through ``to_mdtraj``.  Here the topology is a table, so a selection
compiles to a SQL predicate over its columns and runs through
:meth:`Trajectory.select_atoms` unchanged.

Supported subset (each line maps to the mdtraj construct):

- keywords ``all`` / ``none``
- fields ``name`` ``resname`` ``resid``/``residue`` ``chainid``
  ``index`` ``element``/``symbol`` ``mass``
- implicit equality with value lists: ``name CA CB`` → IN
- comparisons: ``< <= > >= == !=`` and the word forms
  ``lt le gt ge eq ne``
- ranges: ``resid 1 to 10`` → BETWEEN (inclusive, like mdtraj)
- boolean ``and`` / ``or`` / ``not`` (also ``&& || !``), parentheses

- residue-class keywords ``protein`` ``water`` ``backbone``
  ``sidechain`` (r5) — compiled against the public PDB/mdtraj
  residue vocabularies over the ``residue_name``/``name`` columns

Not supported (raises ValueError rather than misselect): geometric
``within .. of ..``, which needs coordinates, not topology.
"""

from __future__ import annotations

import re

#: selection field → topology column (+ whether values are strings)
_FIELDS: dict[str, tuple[str, bool]] = {
    "name": ("name", True),
    "resname": ("residue_name", True),
    "resid": ("residue_id", False),
    "residue": ("residue_id", False),
    "chainid": ("chain_id", False),
    "index": ("atom_id", False),
    "element": ("element", True),
    "symbol": ("element", True),
    "mass": ("mass", False),
}

_CMP_WORDS = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=", "eq": "=", "ne": "<>"}
_CMP_OPS = {"<": "<", "<=": "<=", ">": ">", ">=": ">=", "==": "=", "!=": "<>", "=": "="}

_TOKEN_RE = re.compile(
    r"\s*(\(|\)|<=|>=|==|!=|&&|\|\||<|>|=|!|'[^']*'|\"[^\"]*\"|[^\s()<>=!&|]+)"
)

_UNSUPPORTED = {"within"}  # geometric selections need coordinates

#: standard residue-class vocabularies (public: the PDB chemical
#: component dictionary / mdtraj's residue tables) — what makes
#: ``protein`` / ``water`` / ``backbone`` / ``sidechain`` compile.
PROTEIN_RESIDUES = (
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS",
    "ILE", "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP",
    "TYR", "VAL",
    # common protonation/terminal variants mdtraj also classes as protein
    "HID", "HIE", "HIP", "HSD", "HSE", "HSP", "CYX", "CYM", "ASH", "GLH", "LYN",
)
WATER_RESIDUES = ("HOH", "WAT", "TIP3", "TIP4", "TIP5", "SPC", "SOL", "H2O")
BACKBONE_ATOMS = ("N", "CA", "C", "O", "OXT")


def _residue_class_sql(keyword: str) -> str:
    quote = lambda vals: ", ".join(f"'{v}'" for v in vals)  # noqa: E731
    if keyword in ("water", "waters"):
        return f"(upper(residue_name) IN ({quote(WATER_RESIDUES)}))"
    protein = f"(upper(residue_name) IN ({quote(PROTEIN_RESIDUES)}))"
    if keyword == "protein":
        return protein
    backbone = (
        f"({protein} AND upper(name) IN ({quote(BACKBONE_ATOMS)}))"
    )
    if keyword == "backbone":
        return backbone
    if keyword == "sidechain":
        return f"({protein} AND NOT upper(name) IN ({quote(BACKBONE_ATOMS)}))"
    raise ValueError(f"unknown residue-class keyword {keyword!r}")


def _tokenize(expr: str) -> list[str]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise ValueError(f"cannot tokenize selection at: {expr[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _quote(val: str, is_str: bool) -> str:
    v = val
    if v and v[0] in "'\"" and v[-1] == v[0]:
        v = v[1:-1]
    if is_str:
        return "'" + v.replace("'", "''") + "'"
    try:
        float(v)
    except ValueError:
        raise ValueError(f"field expects a numeric value, got {val!r}") from None
    return v


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def peek_kw(self) -> str | None:
        # lowercased view of the next token for KEYWORD checks only —
        # 'name EQ CA' must compile as a comparison, not silently
        # become (name IN ('EQ', 'CA')) (ADVICE r4).  Quoted tokens
        # keep their quotes, so 'name "EQ"' still selects the literal.
        t = self.peek()
        return t.lower() if t is not None else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of selection")
        self.i += 1
        return t

    # expr := and_expr (OR and_expr)*
    def expr(self) -> str:
        parts = [self.and_expr()]
        while self.peek_kw() in ("or", "||"):
            self.take()
            parts.append(self.and_expr())
        return " OR ".join(parts) if len(parts) > 1 else parts[0]

    def and_expr(self) -> str:
        parts = [self.unary()]
        while self.peek_kw() in ("and", "&&"):
            self.take()
            parts.append(self.unary())
        return " AND ".join(parts) if len(parts) > 1 else parts[0]

    def unary(self) -> str:
        t = self.peek_kw()
        if t in ("not", "!"):
            self.take()
            return f"(NOT {self.unary()})"
        if t == "(":
            self.take()
            inner = self.expr()
            if self.take() != ")":
                raise ValueError("unbalanced parenthesis in selection")
            return f"({inner})"
        return self.term()

    def term(self) -> str:
        t = self.take().lower()
        if t == "all":
            return "(1 = 1)"
        if t == "none":
            return "(1 = 0)"
        if t in ("protein", "water", "waters", "backbone", "sidechain"):
            return _residue_class_sql(t)
        if t in _UNSUPPORTED:
            raise ValueError(
                f"selection keyword {t!r} is not supported (geometric/"
                "chemistry selections need data this topology lacks)"
            )
        if t not in _FIELDS:
            raise ValueError(f"unknown selection field {t!r}")
        col, is_str = _FIELDS[t]
        nxt = self.peek_kw()
        if nxt is None:
            raise ValueError(f"field {t!r} needs a value")
        if nxt in _CMP_OPS or nxt in _CMP_WORDS:
            self.take()
            op = _CMP_OPS.get(nxt) or _CMP_WORDS[nxt]
            return f"({col} {op} {_quote(self.take(), is_str)})"
        # implicit equality: one value, a "to" range, or an IN list
        vals = [self.take()]
        if self.peek_kw() == "to":
            self.take()
            hi = self.take()
            return (
                f"({col} BETWEEN {_quote(vals[0], is_str)}"
                f" AND {_quote(hi, is_str)})"
            )
        stop = {"and", "or", "not", "&&", "||", "!", ")", "to"}
        while True:
            nxt = self.peek_kw()
            if nxt is None or nxt in stop or nxt in _CMP_OPS or nxt in _CMP_WORDS:
                break
            vals.append(self.take())
        if len(vals) == 1:
            return f"({col} = {_quote(vals[0], is_str)})"
        lst = ", ".join(_quote(v, is_str) for v in vals)
        return f"({col} IN ({lst}))"


def mdtraj_selection_to_sql(expr: str) -> str:
    """Compile an mdtraj-style atom selection to a SQL predicate over
    the topology columns (see module docstring for the subset)."""
    toks = _tokenize(expr)
    if not toks:
        raise ValueError("empty selection")
    p = _Parser(toks)
    sql = p.expr()
    if p.peek() is not None:
        raise ValueError(f"unexpected token {p.peek()!r} in selection")
    return sql
