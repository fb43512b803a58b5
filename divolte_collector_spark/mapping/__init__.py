from divolte_collector_spark.mapping.avro_schema import (
    SchemaMappingException,
    avro_to_spark_schema,
    load_avsc,
)
from divolte_collector_spark.mapping.dsl import MappingBuilder

__all__ = [
    "MappingBuilder",
    "SchemaMappingException",
    "avro_to_spark_schema",
    "load_avsc",
]
