"""DataFrame renderings of Vector's 13 transforms (reference src/transforms/).

Each module documents the reference semantics (file:line) it preserves and
the deliberate deltas (batch vs processing-time, hash vs stream-order) per
SURVEY.md §7 risk register.
"""

from vector_spark.operators.route import route, route_labeled, RouteResult  # noqa: F401
from vector_spark.operators.core import (  # noqa: F401
    filter_events,
    sample,
    throttle,
    dedupe,
)
from vector_spark.operators.reduce import reduce_events  # noqa: F401
from vector_spark.operators.metrics import (  # noqa: F401
    aggregate_metrics,
    log_to_metric,
    metric_to_log,
    tag_cardinality_limit,
)
