"""Batch operator implementations — one module per reference capability
family (SURVEY.md §2). Every public function has the uniform signature
``(spark, sf_dir, **params) -> DataFrame`` so the driver contract
(__spark_entry__.queries) can expose them directly.
"""
