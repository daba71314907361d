"""Query modules; each registers engine ops into wri_data_processing_spark.registry."""
