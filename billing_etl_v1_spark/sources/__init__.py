from billing_etl_v1_spark.sources.readers import TPCH_TABLES, load_tables, register_views

__all__ = ["TPCH_TABLES", "load_tables", "register_views"]
