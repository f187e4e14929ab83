from bag_parser_spark.functions import rijksdriehoek, scalars

__all__ = ["rijksdriehoek", "scalars"]
