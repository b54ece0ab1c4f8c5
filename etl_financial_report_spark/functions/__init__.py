"""Composable column-expression helpers (the engine's scalar-function
surface, SURVEY.md §2.7). Everything here returns Column objects built
from pyspark.sql.functions — JVM-side, whole-stage-codegen friendly; no
Python UDFs."""
