"""text_dedup_spark.functions"""
