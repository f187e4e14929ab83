from bag_parser_spark.streaming import events

__all__ = ["events"]
