"""Query modules — each registers into qpmodel_spark.registry on import."""
