from bag_parser_spark.operators import (
    aggregates,
    dedup,
    joins,
    similarity,
    text,
)

__all__ = ["aggregates", "dedup", "joins", "similarity", "text"]
