"""Safe statement builder — the cql-wrapper analog on Spark SQL.

The reference's ``cql"..."`` interpolator builds an IR of alternating text
parts and bound params, supports named + positional params, placeholder
expansion (``In`` → ``?,?,...``, ``Fields``/KeyValArgs → ``k=?,k=?``,
``Inline`` splice), concatenation, and a debug renderer with CQL-style literal
escaping (``CQLStatement.scala:50-330``, ``package.scala:9-81``; tested by
``CQLStatementSpec.scala:19-245``, ``CQLHelperSpec.scala:24-60``).

Here the execution target is Spark SQL's parameterized query API
(``spark.sql(text, args)``) — Catalyst's plan cache plays the role of the
reference's prepared-statement cache, and parameter binding is server-side so
no string splicing of values ever happens (injection-safe by construction).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession


class In:
    """Expands to ``(?, ?, ...)``-style positional slots: ``WHERE x IN ?``."""

    def __init__(self, values: Iterable[Any]):
        self.values = list(values)


class Fields:
    """Expands to ``k = ?, k2 = ?`` (the KeyValArgs analog): ``SET ?``."""

    def __init__(self, mapping: Mapping[str, Any]):
        self.mapping = dict(mapping)


class Inline:
    """Splices raw text into the statement (identifiers, keyspaces): use only
    for trusted identifiers, exactly like the reference's ``Inline()``."""

    def __init__(self, text: str):
        self.text = str(text)


_TOKEN = re.compile(r"\?|:([A-Za-z_][A-Za-z0-9_]*)")


@dataclass(frozen=True)
class Statement:
    """IR: alternating text parts and params — ``len(parts) == len(params)+1``."""

    parts: tuple[str, ...]
    params: tuple[Any, ...]

    def __add__(self, other: "Statement | str") -> "Statement":
        if isinstance(other, str):
            other = Statement((other,), ())
        joined = self.parts[:-1] + (self.parts[-1] + other.parts[0],) + other.parts[1:]
        return Statement(joined, self.params + other.params)

    # -- materialization ----------------------------------------------------

    def to_sql(self) -> tuple[str, list[Any]]:
        """Fold placeholder expansions into final (sql_text, flat_params)."""
        text_parts: list[str] = [self.parts[0]]
        flat: list[Any] = []
        for part, param in zip(self.parts[1:], self.params):
            if isinstance(param, Inline):
                text_parts.append(param.text)
            elif isinstance(param, In):
                if not param.values:
                    # 'x IN ()' is invalid SQL in both engines; fail at build
                    # time with a clear message instead of at execute time
                    raise ValueError("In(...) requires at least one value")
                text_parts.append("(" + ", ".join(["?"] * len(param.values)) + ")")
                flat.extend(param.values)
            elif isinstance(param, Fields):
                text_parts.append(", ".join(f"{k} = ?" for k in param.mapping))
                flat.extend(param.mapping.values())
            else:
                text_parts.append("?")
                flat.append(param)
            text_parts.append(part)
        return "".join(text_parts), flat

    def execute(self, spark: SparkSession) -> DataFrame:
        text, args = self.to_sql()
        return spark.sql(text, args=args) if args else spark.sql(text)

    # -- debug rendering with literal escaping ------------------------------

    def render(self) -> str:
        """Inline every param as an escaped literal (debug/logging only —
        mirrors the reference's toString escaping rules: quote doubling,
        hex blobs, ISO-8601 UTC timestamps, collection literals).

        Rendered from the (parts, params) IR directly — never by re-splitting
        the joined text — so a literal ``?`` inside a text part (quoted
        string, comment) cannot misalign subsequent substitutions."""
        out: list[str] = [self.parts[0]]
        for part, param in zip(self.parts[1:], self.params):
            if isinstance(param, Inline):
                out.append(param.text)
            elif isinstance(param, In):
                out.append("(" + ", ".join(render_literal(v) for v in param.values) + ")")
            elif isinstance(param, Fields):
                out.append(
                    ", ".join(f"{k} = {render_literal(v)}" for k, v in param.mapping.items())
                )
            else:
                out.append(render_literal(param))
            out.append(part)
        return "".join(out)


def render_literal(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, _dt.datetime):
        utc = v.astimezone(_dt.timezone.utc) if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc)
        return "'" + utc.strftime("%Y-%m-%dT%H:%M:%SZ") + "'"
    if isinstance(v, _dt.date):
        return f"'{v.isoformat()}'"
    if isinstance(v, (int, float, Decimal)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(render_literal(x) for x in v) + "]"
    if isinstance(v, (set, frozenset)):
        return "{" + ", ".join(sorted(render_literal(x) for x in v)) + "}"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{render_literal(k)}: {render_literal(val)}" for k, val in v.items()) + "}"
    raise TypeError(f"cannot render literal of type {type(v).__name__}")


def cql(text: str, *args: Any, **named: Any) -> Statement:
    """Build a Statement from text with ``?`` positional and ``:name`` named
    markers.  Named markers may repeat; each occurrence binds the same value.

    >>> cql("SELECT * FROM t WHERE a = ? AND b IN ?", 5, In([1, 2]))
    >>> cql("UPDATE t SET ? WHERE id = :id", Fields({"x": 1}), id=9)
    """
    parts: list[str] = []
    params: list[Any] = []
    pos = 0
    arg_iter = iter(args)
    last = 0
    for m in _TOKEN.finditer(text):
        parts.append(text[last : m.start()])
        last = m.end()
        if m.group(0) == "?":
            try:
                params.append(next(arg_iter))
            except StopIteration:
                raise ValueError("more ? markers than positional args") from None
        else:
            name = m.group(1)
            if name not in named:
                raise ValueError(f"missing named parameter :{name}")
            params.append(named[name])
    remaining = list(arg_iter)
    if remaining:
        raise ValueError(f"{len(remaining)} unused positional args")
    parts.append(text[last:])
    return Statement(tuple(parts), tuple(params))
