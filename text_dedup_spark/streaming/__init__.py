"""text_dedup_spark.streaming"""
