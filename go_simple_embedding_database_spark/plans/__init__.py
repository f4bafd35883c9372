from go_simple_embedding_database_spark.plans.exchange_metrics import (
    exchange_metrics,
)
from go_simple_embedding_database_spark.plans.explain_utils import (
    formatted_plan,
    assert_pushed_filters,
    assert_in_plan,
)

__all__ = ["formatted_plan", "assert_pushed_filters", "assert_in_plan",
           "exchange_metrics"]
