"""text_dedup_spark.sources"""
