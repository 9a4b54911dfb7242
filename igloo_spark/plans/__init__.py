"""Plan utilities: fingerprints and explain-audit helpers."""

from igloo_spark.plans.audit import (  # noqa: F401
    PlanAudit,
    audit_plan,
    audit_report,
    runtime_metrics,
    runtime_report,
)
from igloo_spark.plans.cache import ResultCache, plan_fingerprint  # noqa: F401
