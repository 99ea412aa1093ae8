"""text_dedup_spark.operators"""
