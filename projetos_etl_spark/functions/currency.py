"""Currency-string cleaning (reference ops #11+#12).

The reference scrubs ``R$``/``$``/``,`` from seven columns with pandas
*literal* ``str.replace`` then casts to float
(``dags/silver/dag_silver_financial_sample.py:76-82``; note ``silver:76``
forgets the cast for ``Manufacturing Price`` — a bug we fix). The
canonical Spark form is a single character-class regexp_replace, which is
equivalent on this alphabet because every stripped token is a single
literal character or the fixed prefix ``R$`` (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Characters stripped from currency strings before the numeric cast.
CURRENCY_JUNK_RE = r"[R$,\s]"


def clean_currency(col: Column | str) -> Column:
    """``'R$1,234.56' -> 1234.56`` (DoubleType). NULL-safe: a string with
    no digits casts to NULL rather than raising (Spark cast semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_cast, not cast: under ANSI SQL mode (Spark 4 default) a plain
    # cast on a non-numeric string raises; the ETL semantics we want for
    # dirty currency data is NULL-and-continue.
    return F.regexp_replace(c, CURRENCY_JUNK_RE, "").try_cast("double")
