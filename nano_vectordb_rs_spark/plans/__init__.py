from nano_vectordb_rs_spark.plans.audit import audit_plan, plan_string

__all__ = ["audit_plan", "plan_string"]
