"""Column-expression factories — the Spark equivalent of the reference's
dbt Jinja macros (SURVEY.md §2.10): plain Python functions returning
``Column`` objects, fully Catalyst-optimizable, zero UDFs."""
