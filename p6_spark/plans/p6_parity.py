"""Queries demonstrating the reference's (P6) operator semantics over the
harness tables, each with a DuckDB oracle. The clinical pipelines
themselves are exercised on fixture workbook tables in tests/; these
queries prove the same Column expressions on oracle-checkable data.
"""

from __future__ import annotations
