"""spark-submit entry point (north rule: submitted via spark-submit --py-files).

    python tools/make_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/text_dedup_spark.zip \
        run_job.py --config configs/minhash.toml

Local-mode equivalent: ``python -m text_dedup_spark.pipeline --config ...``.
"""

from text_dedup_spark.pipeline import main

if __name__ == "__main__":
    main()
