"""text_dedup_spark.plans"""
