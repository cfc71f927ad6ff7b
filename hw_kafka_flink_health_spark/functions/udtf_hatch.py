"""Python UDTF escape hatch (Spark 4 user-defined table functions).

The engine's rule is native expressions first (per-row Python is the
slow path — see functions/parsing.py, which replaced the reference's
per-record ``map(parse_event)`` with Catalyst `from_json`). But the
escape-hatch tiers must exist for logic Catalyst genuinely can't
express; the ladder, fastest first:

1. built-in expressions / higher-order functions (everything in
   operators/),
2. Arrow-batched pandas_udf / applyInPandas / mapInPandas
   (operators/stateful.py, operators/multimodal.py),
3. **UDTF** — one input row to N output rows with imperative logic
   (this module),
4. RDD mapPartitions: not used anywhere, by design.

`PropsKV` is the demo UDTF: flatten the events table's JSON `props`
into (key, value) rows. It duplicates what native
``explode(from_json(props, MAP<STRING,STRING>))`` does — deliberately,
so tests can pin the UDTF's output against the native plan
(tests/test_stateful.py::test_udtf_matches_native_explode). Use the
native form in real pipelines; reach for a UDTF only when the row fan-
out needs real Python (recursive descent, external parsers, tokenizers).
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="k: string, v: string")
class PropsKV:
    """(json_str) -> one row per top-level key, values re-serialized as
    strings (scalars unquoted, containers as compact JSON)."""

    def eval(self, props: str):  # noqa: D102
        if props is None:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k in sorted(obj):
            v = obj[k]
            yield k, (
                json.dumps(v, separators=(",", ":"))
                if isinstance(v, (dict, list))
                else str(v)
            )


def register_udtfs(spark) -> None:
    """Expose the escape-hatch UDTFs to spark.sql (lateral call syntax:
    ``SELECT e.event_id, p.* FROM events e, LATERAL props_kv(e.props) p``)."""
    spark.udtf.register("props_kv", PropsKV)
