"""Aggregate query catalog — importing a module registers its queries.

Exposes QUERIES / ORACLE_SQL for __spark_entry__.py.
"""

from __future__ import annotations

import flink_ms_spark.plans.analytics  # noqa: F401
import flink_ms_spark.plans.northstar  # noqa: F401
import flink_ms_spark.plans.pipeline  # noqa: F401
import flink_ms_spark.plans.reference  # noqa: F401
import flink_ms_spark.plans.relational  # noqa: F401
from flink_ms_spark.plans.registry import ORACLE_SQL, QUERIES  # noqa: F401
