"""Seed CSV loading (S9) — dbt seed analog.

The reference loads 4 Russell-3000 constituent CSVs with declared
column types and `quote_columns: false` (dbt_project.yml:26-52).
Snowflake's loader strips digit-grouping commas from quoted numerics
("988,555,988.64" -> float, seeds/russell3000_2024_1231.csv); Spark's
CSV reader does not — so numerics ride in as strings and are parsed
explicitly (models/staging.py parse_grouped_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .models.staging import parse_grouped_number


def seed_schema(cols: list[str]) -> StructType:
    """Seeds are read all-string (quote-aware), then cast per the
    declared column types — never inferSchema (SURVEY §1.2)."""
    return StructType([StructField(c, StringType()) for c in cols])


def read_seed_csv(spark: SparkSession, path: str, string_cols: list[str],
                  grouped_numeric_cols: list[str]) -> DataFrame:
    """Load one seed CSV: declared columns, header row, quoted fields;
    grouped-numeric columns are comma-stripped and cast to double."""
    cols = string_cols + grouped_numeric_cols
    df = (spark.read
          .option("header", True)
          .option("quote", '"')
          .schema(seed_schema(cols))
          .csv(path))
    for c in grouped_numeric_cols:
        df = df.withColumn(c, parse_grouped_number(F.col(c)))
    return df
