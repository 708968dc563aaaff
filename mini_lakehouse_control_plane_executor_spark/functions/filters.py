"""Reference filter grammar → Spark Column, plus stats-based file pruning.

The reference's filter language is exactly one whitespace-tokenized
comparison ``column <op> literal`` with ops ``= == > < >= <= != <>`` and
literal inference quoted-string → int64 → float64 → bool
(``worker/src/task_executor.rs:474-516``). We parse that grammar for
strict parity, and fall back to handing the whole string to Spark's SQL
expression parser — so any full SQL predicate (AND/OR/NOT, BETWEEN, IN,
LIKE, IS NULL, column-vs-column) works as a superset.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {"=", "==", ">", "<", ">=", "<=", "!=", "<>"}


class FilterParseError(ValueError):
    pass


@dataclass(frozen=True)
class Comparison:
    column: str
    op: str
    value: object  # str | int | float | bool


def _parse_literal(tok: str) -> object:
    """Literal inference order of ``task_executor.rs:488-501``:
    quoted string → int → float → bool → bare string."""
    if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    if tok.lower() in ("true", "false"):
        return tok.lower() == "true"
    return tok


def parse_comparison(filter_str: str) -> Comparison | None:
    """Parse ``col op literal``; None if it isn't that shape (caller then
    treats the string as a general SQL expression)."""
    parts = filter_str.split()
    if len(parts) != 3:
        return None
    col, op, lit = parts
    if op not in _OPS:
        return None
    return Comparison(col, op, _parse_literal(lit))


def _apply_op(lhs: Column, op: str, value: object) -> Column:
    if op in ("=", "=="):
        return lhs == value
    if op in ("!=", "<>"):
        return lhs != value
    if op == ">":
        return lhs > value
    if op == "<":
        return lhs < value
    if op == ">=":
        return lhs >= value
    return lhs <= value


def parse_filter(filter_str: str) -> Column:
    """Reference grammar if it matches, else full Spark SQL expression."""
    cmp = parse_comparison(filter_str)
    if cmp is not None:
        return _apply_op(F.col(cmp.column), cmp.op, cmp.value)
    try:
        return F.expr(filter_str)
    except Exception as exc:  # pragma: no cover - parse errors surface here
        raise FilterParseError(f"cannot parse filter {filter_str!r}: {exc}") from exc


def prune_files(files, filter_str: str):
    """File-level min/max pruning for single comparisons and
    conjunctions of them (``a AND b`` prunes as the intersection of its
    terms' prunes — sound because a file with no rows matching one term
    has no rows matching the conjunction).

    Keeps any file whose [min,max] range for the filtered column could
    contain matching rows (conservative: files with no stats are kept,
    and any predicate shape not recognized prunes nothing). The
    reference models these stats but never prunes
    (``pkg/coordinator/query_planner.go:249-255``); at 100 TB pruning is
    mandatory, and this mirrors what Delta data skipping does.
    """
    import re as _re

    cmp = parse_comparison(filter_str)
    if cmp is not None:
        return _prune_single(files, cmp)
    # Top-level conjunction of simple comparisons. Stay out of anything
    # with quotes, parens, or OR — conservative beats clever here.
    s = filter_str
    if "'" not in s and '"' not in s and "(" not in s and not _re.search(
        r"\bor\b", s, _re.I
    ):
        parts = _re.split(r"\s+and\s+", s, flags=_re.I)
        if len(parts) > 1:
            cmps = [parse_comparison(p.strip()) for p in parts]
            if all(c is not None for c in cmps):
                for c in cmps:
                    files = _prune_single(files, c)
                return files
    return files


def _prune_single(files, cmp: Comparison):
    if isinstance(cmp.value, bool):
        return files
    kept = []
    for f in files:
        mn = f.min_values.get(cmp.column)
        mx = f.max_values.get(cmp.column)
        if mn is None or mx is None:
            kept.append(f)
            continue
        try:
            v = cmp.value
            if cmp.op in ("=", "=="):
                keep = mn <= v <= mx
            elif cmp.op == ">":
                keep = mx > v
            elif cmp.op == ">=":
                keep = mx >= v
            elif cmp.op == "<":
                keep = mn < v
            elif cmp.op == "<=":
                keep = mn <= v
            else:  # != / <> — only an all-equal file can be skipped
                keep = not (mn == mx == v)
        except TypeError:
            keep = True  # incomparable types: stay conservative
        if keep:
            kept.append(f)
    return kept
