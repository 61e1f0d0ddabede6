"""Query modules. Importing a module registers its queries (see registry.py).

Use `iris_pyspark_spark.registry.load_all()` to force-load everything.
"""
