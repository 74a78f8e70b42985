"""Structured output over extraction output (SURVEY.md §2 T4).

The reference parses model output into a user-supplied Pydantic schema
(`core/client.py:89-96`; Invoice/LineItem example README.md:127-156). The
Spark-native analogue: apply a user-supplied DDL schema to the rows of the
first markdown pipe table of each extracted document — expression-only
(regexp + higher-order functions + to_json/from_json), no Python in the
hot path, so the operator rides whole-stage codegen and scales like any
projection.

Row shape: one output row per table data row; cells are exposed to the
user schema under positional keys c1..cN (markdown tables carry no stable
field names — the positional contract is what a schema can bind to).
`from_json` binds the fields; a `try_cast` post-pass applies the requested
types (markdown cells are JSON strings, which from_json will not coerce),
so "c2 INT" yields a typed column with NULL on non-numeric cells — the
exact analogue of a schema-validated parse failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MAX_COLS = 8  # positional cells exposed to the user schema (c1..c8)

# first contiguous block of lines starting with '|' — the first pipe table
_TABLE_BLOCK_RE = r"(?m)((?:^\|.*\n)+)"


def first_table_records(
    df: DataFrame,
    user_schema: str,
    md_col: str = "markdown",
    key_col: str = "url",
) -> DataFrame:
    """One row per data row of each document's FIRST markdown pipe table,
    parsed through `user_schema` (a DDL string over positional keys c1..cN).

    Returns (key_col, row_no, rec STRUCT<user_schema>). Documents without a
    pipe table produce no rows; the header and '|---|' separator rows are
    never emitted as data.
    """
    schema = StructType.fromDDL(user_schema)
    block = F.regexp_extract(
        F.concat(F.col(md_col), F.lit("\n")), _TABLE_BLOCK_RE, 1)
    lines = F.filter(F.split(block, "\n"), lambda ln: ln.startswith("|"))
    # [header, separator, data...] -> data only
    data = F.slice(lines, 3, F.greatest(F.size(lines) - 2, F.lit(0)))
    rows = df.select(F.col(key_col), F.posexplode(data).alias("row_no", "ln"))
    cells = F.split(F.col("ln"), r"\|")            # ['', c1, ..., cN, '']
    inner = F.slice(cells, 2, F.greatest(F.size(cells) - 2, F.lit(0)))
    trimmed = F.transform(inner, lambda c: F.trim(c))
    # F.get (0-based) is NULL-safe out of range even under ANSI mode
    js = F.to_json(F.struct(*[
        F.get(trimmed, i).alias(f"c{i + 1}") for i in range(MAX_COLS)
    ]))
    # bind fields as strings, then try_cast to the requested types (NULL on
    # a non-conforming cell rather than an ANSI cast error failing the task)
    string_ddl = ", ".join(f"{f.name} string" for f in schema.fields)
    raw = F.from_json(js, string_ddl)
    rec = F.struct(*[
        raw.getField(f.name).try_cast(f.dataType).alias(f.name)
        for f in schema.fields
    ])
    return rows.select(key_col, "row_no", rec.alias("rec"))


def with_structured(
    df: DataFrame,
    user_schema: str,
    md_col: str = "markdown",
    key_col: str = "url",
) -> DataFrame:
    """first_table_records with the user-schema struct flattened to typed
    top-level columns — the ParseResult-with-structured-content shape."""
    rec = first_table_records(df, user_schema, md_col, key_col)
    return rec.select(key_col, "row_no", "rec.*")
