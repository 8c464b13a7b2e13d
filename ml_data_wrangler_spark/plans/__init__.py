from ml_data_wrangler_spark.plans.registry import (  # noqa: F401
    load_all_queries,
    oracle_sql,
    queries,
)
