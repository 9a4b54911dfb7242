"""Plan utilities: fingerprints and explain-audit helpers."""

from igloo_spark.plans.audit import PlanAudit, audit_plan, audit_report  # noqa: F401
from igloo_spark.plans.cache import ResultCache, plan_fingerprint  # noqa: F401
