from argus_spark.reducers.examples import build_example_registry  # noqa: F401
