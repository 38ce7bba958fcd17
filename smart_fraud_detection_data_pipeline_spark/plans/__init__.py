from smart_fraud_detection_data_pipeline_spark.plans.explain import (  # noqa: F401
    executed_plan,
    formatted_plan,
    plan_counts,
)
