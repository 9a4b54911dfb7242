"""Plan utilities: fingerprints and explain-audit helpers."""

from igloo_spark.plans.cache import ResultCache, plan_fingerprint  # noqa: F401
