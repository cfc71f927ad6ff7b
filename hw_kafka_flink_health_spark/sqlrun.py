"""Ad-hoc SQL runner: the engine's `spark-sql`-style front door.

Registers every synthetic table (region nation customer supplier part
orders lineitem events documents embeddings) as a view over a scale-factor
directory and executes arbitrary SQL against them, printing JSON lines.

    python -m hw_kafka_flink_health_spark.sqlrun \
        --sf-dir /root/testdata/sf0.01 \
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"

A user of the reference gets the full declarative surface (the reference
itself has no SQL at all — SURVEY §2.B); every Catalyst optimization the
engine relies on applies to these queries unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sql", help="SQL text, or @/path/to/file.sql")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--limit", type=int, default=1000,
                   help="max rows printed (the query itself is not limited)")
    p.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan instead of rows")
    args = p.parse_args(argv)

    sql = args.sql
    if sql.startswith("@"):
        with open(sql[1:]) as f:
            sql = f.read()

    from hw_kafka_flink_health_spark.session import get_spark
    from hw_kafka_flink_health_spark.sources.files import register_views

    spark = get_spark(app_name="sqlrun")
    register_views(spark, args.sf_dir)
    df = spark.sql(sql)
    if args.explain:
        # py4j can't resolve the Scala ExplainMode overload from a bare
        # string; PythonSQLUtils.explainString is the supported bridge
        # (same incantation as scripts/dump_plans.py).
        print(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
        return 0
    out = df.limit(args.limit).toJSON().collect()
    for line in out:
        print(line)
    print(json.dumps({"rows_printed": len(out)}), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
