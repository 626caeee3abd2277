"""Reusable column-expression packs (SURVEY.md §2B "Scalar fns") — all
built-in ``pyspark.sql.functions`` compositions (JVM-side, codegen'd);
Python UDFs appear only in the explicitly-named ``udf_*`` surface.
"""
