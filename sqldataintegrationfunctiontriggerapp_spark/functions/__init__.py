"""Scalar/text/JSON column-function library. All functions return Column
expressions built from pyspark.sql.functions (JVM-side, codegen'd) -- no
Python UDFs in the hot path."""
