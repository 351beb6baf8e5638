"""Pure-Python extraction core (stages E1–E15 of SURVEY.md §2A).

No Spark imports anywhere in this subpackage — everything here runs inside
the Arrow/pandas UDF worker and is unit-tested without a SparkSession.
"""
