"""Column-expression libraries (the native-Spark fast path).

Everything here is built from ``pyspark.sql.functions`` so it stays inside
whole-stage codegen — the Spark analogue of the reference's Rust batch
kernels (``src/text_ops.rs``, ``src/image_ops.rs``): vectorized, GIL-free,
no per-row Python.
"""
