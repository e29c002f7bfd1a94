from .audit import PlanAudit, plan_audit
from .tables import TABLES, load_tables, table

__all__ = ["PlanAudit", "plan_audit", "TABLES", "load_tables", "table"]
