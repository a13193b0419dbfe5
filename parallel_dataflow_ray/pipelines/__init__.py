"""Named pipelines: the queries()/oracle_sql() registry surface."""

from .queries import QUERIES, ORACLE_SQL, flagship_entry

__all__ = ["QUERIES", "ORACLE_SQL", "flagship_entry"]
