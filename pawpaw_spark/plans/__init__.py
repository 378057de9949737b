from pawpaw_spark.plans.plumule import PlumuleEngine, parse_query

__all__ = ["PlumuleEngine", "parse_query"]
