from .explain import formatted_plan, plan_has, scan_pushdown_report  # noqa: F401
