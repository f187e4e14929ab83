from bag_parser_spark.plans import catalog

__all__ = ["catalog"]
