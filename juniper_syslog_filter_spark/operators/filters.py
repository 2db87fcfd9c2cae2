"""Filter operators P1-P3 (SURVEY.md §2.2) as lazy DataFrame transforms.

Each reference filter was a read-filter-write pass over every staged CSV;
here they are pure Catalyst predicates that fuse into the scan stage
(predicate pushdown + whole-stage codegen), so a 100 TB scan with a
selective keyword touches only matching row groups' worth of downstream
work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_keyword(df: DataFrame, keyword: str, column: str = "Message") -> DataFrame:
    """P1 (modules/filter_keyword.py:21-94): case-sensitive literal
    substring match; null → drop (reference: ``case=True, na=False``).

    ``contains``, not ``rlike`` — the keyword may hold regex
    metacharacters (SURVEY §2.2).
    """
    return df.filter(F.col(column).contains(keyword))


def filter_severity(df: DataFrame, severity: str = "CRITICAL", column: str = "Severity") -> DataFrame:
    """P2 (modules/filter_critical.py:30-129): equality on Severity."""
    return df.filter(F.col(column) == F.lit(severity))


def filter_and_merge_severity(df: DataFrame, severity: str = "CRITICAL") -> DataFrame:
    """P3 (modules/filter_critical_and_merge.py:30-127): filter + single
    output partition (the reference concatenates survivors to one file)."""
    return filter_severity(df, severity).coalesce(1)
