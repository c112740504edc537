"""Sources & sinks beyond plain parquet (reference ``loaders/`` and
``writers/`` — SURVEY §2.1/§2.2)."""
