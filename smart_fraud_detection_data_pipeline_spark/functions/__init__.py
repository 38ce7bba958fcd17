from smart_fraud_detection_data_pipeline_spark.functions.numeric import exact_sum_double  # noqa: F401
from smart_fraud_detection_data_pipeline_spark.functions.timeutil import minute_window, stringify_window  # noqa: F401
