"""Typed row access — the RichRow analog (cql-wrapper
``Implicits.scala:104-213``: ``get[T]/getOpt/tryGet/getList/getSet/getMap``
with ClassTag-driven decoding and defaults).

DataFrames are typed up front, so most of the reference's late decoding is
unnecessary; what remains useful at the Python boundary is safe, defaulted,
type-checked access to collected ``Row`` objects.
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal
from typing import Any, Optional, Type, TypeVar

from pyspark.sql import Row

T = TypeVar("T")

_COERCIBLE: dict[type, tuple[type, ...]] = {
    int: (bool,),            # bool is an int subclass; reject it for int asks
    float: (int,),
    Decimal: (int,),
    _dt.datetime: (),
    bytes: (bytearray,),
    str: (),
}


class RowDecodeError(TypeError):
    pass


def get(row: Row, field: str, as_type: Type[T]) -> T:
    """Typed fetch: raises on missing field, null value, or type mismatch."""
    value = try_get(row, field, as_type)
    if value is None:
        raise RowDecodeError(f"field {field!r} is null (use get_opt for nullable access)")
    return value


def get_opt(row: Row, field: str, as_type: Type[T]) -> Optional[T]:
    """Typed fetch returning None for null values (Option semantics)."""
    return try_get(row, field, as_type)


def get_or(row: Row, field: str, as_type: Type[T], default: T) -> T:
    """Typed fetch with a default for null/missing (the getOrElse pattern)."""
    try:
        value = try_get(row, field, as_type)
    except RowDecodeError:
        return default
    return default if value is None else value


def try_get(row: Row, field: str, as_type: Type[T]) -> Optional[T]:
    if field not in row.__fields__:
        raise RowDecodeError(f"row has no field {field!r}; fields: {row.__fields__}")
    value = row[field]
    if value is None:
        return None
    if isinstance(value, as_type):
        if as_type is int and isinstance(value, bool):
            raise RowDecodeError(f"field {field!r} is boolean, not int")
        return value
    coercions = _COERCIBLE.get(as_type, ())
    if isinstance(value, coercions):
        return as_type(value)  # type: ignore[call-arg]
    raise RowDecodeError(
        f"field {field!r} is {type(value).__name__}, requested {as_type.__name__}"
    )


def get_list(row: Row, field: str, element_type: Type[T]) -> list[T]:
    value = row[field]
    if value is None:
        return []
    return [v if isinstance(v, element_type) else element_type(v) for v in value]  # type: ignore[call-arg]


def get_set(row: Row, field: str, element_type: Type[T]) -> set[T]:
    return set(get_list(row, field, element_type))


def get_map(row: Row, field: str) -> dict[Any, Any]:
    value = row[field]
    return dict(value) if value is not None else {}
