"""Calendar attribute expressions (the dimData semantics).

Reproduces the reference date-dimension derivations
(/root/reference/scripts/init.sql:63-100): ISO day-of-week, pt-BR weekday
and month names, day-of-year, bimester/trimester/semester.  All pure
Catalyst expressions so they can be used both to generate a date dimension
and to derive attributes on the fly from an event date (which is how a
100 TB fact table avoids one join entirely when only coarse calendar
attributes are needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ISO day-of-week: Monday=1..Sunday=7. Spark's dayofweek is Sunday=1..Saturday=7.
def isodow(d: Column) -> Column:
    return ((F.dayofweek(d) + 5) % 7) + 1


_WEEKDAYS_PTBR = {
    1: "Segunda-feira",
    2: "Terça-feira",
    3: "Quarta-feira",
    4: "Quinta-feira",
    5: "Sexta-feira",
    6: "Sábado",
    7: "Domingo",
}

_MONTHS_PTBR = {
    1: "Janeiro",
    2: "Fevereiro",
    3: "Março",
    4: "Abril",
    5: "Maio",
    6: "Junho",
    7: "Julho",
    8: "Agosto",
    9: "Setembro",
    10: "Outubro",
    11: "Novembro",
    12: "Dezembro",
}


def _case_ladder(key: Column, mapping: dict[int, str]) -> Column:
    expr = None
    for k, v in mapping.items():
        expr = F.when(key == k, v) if expr is None else expr.when(key == k, v)
    return expr


def weekday_name_ptbr(d: Column) -> Column:
    """pt-BR weekday name from a date column (init.sql:66-74 semantics)."""
    return _case_ladder(isodow(d), _WEEKDAYS_PTBR)


def month_name_ptbr(d: Column) -> Column:
    """pt-BR month name from a date column (init.sql:78-91 semantics)."""
    return _case_ladder(F.month(d), _MONTHS_PTBR)


def bimester(d: Column) -> Column:
    return F.ceil(F.month(d) / F.lit(2.0)).cast("int")


def trimester(d: Column) -> Column:
    return F.ceil(F.month(d) / F.lit(3.0)).cast("int")


def semester(d: Column) -> Column:
    return F.ceil(F.month(d) / F.lit(6.0)).cast("int")


def month_name_ptbr_sql(col: str) -> str:
    """ANSI-SQL twin of :func:`month_name_ptbr` for the DuckDB oracle."""
    whens = "\n".join(
        f"WHEN {k} THEN '{v}'" for k, v in _MONTHS_PTBR.items()
    )
    return f"CASE EXTRACT(MONTH FROM {col}) {whens} END"


def weekday_name_ptbr_sql(col: str) -> str:
    whens = "\n".join(f"WHEN {k} THEN '{v}'" for k, v in _WEEKDAYS_PTBR.items())
    return f"CASE isodow({col}) {whens} END"
