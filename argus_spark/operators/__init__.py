from argus_spark.operators import relational, utxo  # noqa: F401
