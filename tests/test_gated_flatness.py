"""Every gated query must emit a driver-hashable (flat) schema.

The correctness harness canonicalizes results through pandas
``sort_values`` / hashing, which dies on list/dict cells (``unhashable
type: 'list'``). Array-valued results must therefore be projected as
deterministic JSON text (``F.to_json``) before leaving a gated query.
This test builds (does not execute) every registered query at sf0.001
and asserts the top-level schema holds only atomic types.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from divolte_collector_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_all_gated_schemas_are_flat(spark):
    offenders = {}
    for name, rq in sorted(all_queries().items()):
        df = rq.fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-flat gated outputs: {offenders}"
