"""Command-line entry point — the engine's ksql-CLI twin (SURVEY §3
EP1/EP2): run registered queries, ad-hoc SQL, or the full reference
pipeline DAG without writing a driver script.

    python -m kafka_cdc_elasticsearch_pipeline_spark list [--tag ext]
    python -m kafka_cdc_elasticsearch_pipeline_spark run tpch_q6_forecast_revenue
    python -m kafka_cdc_elasticsearch_pipeline_spark sql "SELECT count(*) FROM events"
    python -m kafka_cdc_elasticsearch_pipeline_spark pipeline --rows 600 [--out DIR]
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def _ksql_repl(engine, limit: int, input_fn=input, out=None) -> int:
    """Interactive ksql prompt (the reference drives its statements
    through `ksql http://ksqldb:8088` — readme.md's CLI flow). Reads
    statements terminated by ';' (multi-line), executes them against
    the engine, prints SELECT results; `exit`/`quit` (or EOF) leaves.
    ``input_fn``/``out`` are injectable for tests."""
    import sys as _sys

    out = out or _sys.stdout
    try:  # line editing + history when a tty is attached
        import readline  # noqa: F401
    except ImportError:
        pass
    print(
        "ksql> interactive mode — statements end with ';', 'exit;' quits.\n"
        "      SHOW STREAMS | SHOW TABLES | DESCRIBE <name> | SELECT ... ;",
        file=out,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.ksql.translate import (
        split_statements,
        strip_comments,
    )

    def _in_open_quote(text: str) -> bool:
        # mirror split_statements' quote rules: a trailing ';' inside a
        # still-open string literal (VALUE_FORMAT='JSON;\n...') is data,
        # not a statement terminator
        in_q = False
        for ch in strip_comments(text):
            if ch == "'":
                in_q = not in_q
        return in_q

    buf: list[str] = []
    while True:
        prompt = "ksql> " if not buf else "   -> "
        try:
            line = input_fn(prompt)
        except (EOFError, KeyboardInterrupt):
            print("", file=out)
            break
        s = line.strip()
        if not buf and s.rstrip(";").lower() in ("exit", "quit"):
            break
        if not s and not buf:
            continue
        buf.append(line)
        if not s.endswith(";") or _in_open_quote("\n".join(buf)):
            continue
        text, buf = "\n".join(buf), []
        for stmt in split_statements(text):
            try:
                df = engine.execute(stmt)
            except Exception as exc:  # noqa: BLE001 — REPL must survive bad input
                print(f"statement_error: {exc}", file=out)
                continue
            if df is not None:
                # route the rendered table through `out` (df.show
                # prints to process stdout and would escape an
                # injected stream)
                print(df._jdf.showString(limit, 0, False), file=out)
            else:
                print("Executed.", file=out)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafka_cdc_elasticsearch_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", help="filter by tag (e.g. ext, streaming, scale)")

    p_run = sub.add_parser("run", help="run a registered query")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default=DEFAULT_SF)
    p_run.add_argument("--limit", type=int, default=20)

    p_sql = sub.add_parser("sql", help="run ad-hoc SQL over the harness tables")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf", default=DEFAULT_SF)
    p_sql.add_argument("--limit", type=int, default=20)

    p_pipe = sub.add_parser("pipeline", help="run the reference DAG on datagen fixtures")
    p_pipe.add_argument("--rows", type=int, default=600)
    p_pipe.add_argument("--out", help="write each sink as parquet under this dir")

    p_ksql = sub.add_parser(
        "ksql", help="run a ksqlDB-dialect .sql script against harness tables"
        " (omit FILE for an interactive prompt — the ksql-CLI twin, EP1)"
    )
    p_ksql.add_argument("file", nargs="?")
    p_ksql.add_argument("--sf", default=DEFAULT_SF)
    p_ksql.add_argument(
        "--topic",
        action="append",
        default=[],
        help="topic=table mapping (default: every harness table under its own "
        "name, with rowtime bound to its event-time column)",
    )
    p_ksql.add_argument("--limit", type=int, default=20)

    p_serve = sub.add_parser(
        "serve", help="ksqlDB-shaped REST server (POST /ksql, POST /query)"
    )
    p_serve.add_argument("--sf", default=DEFAULT_SF)
    p_serve.add_argument("--port", type=int, default=8088)

    p_search = sub.add_parser(
        "serve-search",
        help="Elasticsearch-role REST server over the maintained "
        "indexes (POST /search, GET /status)",
    )
    p_search.add_argument("--bm25-root", default=None)
    p_search.add_argument("--ivfpq-root", default=None)
    p_search.add_argument(
        "--ivfpq-pointer", default=None,
        help="mount the vector index through a serving pointer "
        "(blue/green swaps become invisible to consumers)",
    )
    p_search.add_argument(
        "--sf", default=DEFAULT_SF,
        help="harness dir whose embeddings table resolves query_ids",
    )
    p_search.add_argument("--port", type=int, default=9200)
    p_search.add_argument(
        "--source-table", default=None,
        help="the CDC source lake table: turns on /status's "
        "convergence block (per-index applied watermark vs head)",
    )
    p_search.add_argument(
        "--bm25-app-id", default=None,
        help="BM25 maintenance lineage for the convergence block",
    )
    p_search.add_argument(
        "--ivfpq-app-id", default=None,
        help="IVF-PQ maintenance lineage for the convergence block",
    )
    p_search.add_argument(
        "--doc-meta", default=None,
        help="parquet path (or lake table) of doc metadata, ONE row "
        "per doc_id (a changelog with duplicate ids fans out the "
        "sort join — mount the latest-per-key view): turns on the "
        "'sort' and 'aggs' request surfaces (the mapped fields of "
        "the ES role)",
    )

    args = ap.parse_args(argv)

    from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES

    if args.cmd == "list":
        for name, spec in QUERIES.items():
            if args.tag and args.tag not in spec.tags:
                continue
            marks = ("bench" if spec.bench else "") + ("" if spec.oracle else " no-oracle")
            print(f"{name:45s} [{', '.join(spec.tags)}]{(' <' + marks + '>') if marks.strip() else ''}")
        return 0

    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run":
        if args.name not in QUERIES:
            print(f"unknown query: {args.name} (try `list`)", file=sys.stderr)
            return 2
        QUERIES[args.name].spark(spark, args.sf).show(args.limit, truncate=False)
        return 0

    if args.cmd == "sql":
        from kafka_cdc_elasticsearch_pipeline_spark import sql

        sql(spark, args.sf, args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "ksql":
        from pyspark.sql import functions as F

        from kafka_cdc_elasticsearch_pipeline_spark.ksql import KsqlEngine
        from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import (
            TABLE_NAMES,
            load_table,
        )

        time_cols = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}
        topics = {}
        mappings = args.topic or [f"{t}={t}" for t in TABLE_NAMES]
        for spec in mappings:
            topic, _, table = spec.partition("=")
            df = load_table(spark, args.sf, table or topic)
            tc = time_cols.get(table or topic)
            topics[topic] = (
                df.withColumn("rowtime", F.col(tc)) if tc and "rowtime" not in df.columns
                else df
            )
        from kafka_cdc_elasticsearch_pipeline_spark.ksql.translate import (
            split_statements,
        )

        engine = KsqlEngine(spark, topics)
        if args.file is None or args.file == "-":
            return _ksql_repl(engine, args.limit)
        with open(args.file) as f:
            statements = split_statements(f.read())
        for stmt in statements:
            df = engine.execute(stmt)
            head = stmt.strip().split(None, 2)
            if df is not None and head and head[0].upper() == "SELECT":
                df.show(args.limit, truncate=False)
            elif head and head[0].upper() == "CREATE":
                print(f"{head[0].title()} {head[1].lower()}: {stmt.split()[2]}")
        print("relations:", ", ".join(engine.relations) or "(none)")
        return 0

    if args.cmd == "serve":
        from pyspark.sql import functions as F

        from kafka_cdc_elasticsearch_pipeline_spark.ksql import KsqlEngine
        from kafka_cdc_elasticsearch_pipeline_spark.ksql.rest import KsqlRestServer
        from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import (
            TABLE_NAMES,
            load_table,
        )

        time_cols = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}
        topics = {}
        for t in TABLE_NAMES:
            df = load_table(spark, args.sf, t)
            tc = time_cols.get(t)
            topics[t] = df.withColumn("rowtime", F.col(tc)) if tc else df
        server = KsqlRestServer(KsqlEngine(spark, topics), port=args.port).start()
        print(f"listening on {server.url} (POST /ksql, POST /query, GET /info)")
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return 0

    if args.cmd == "serve-search":
        from kafka_cdc_elasticsearch_pipeline_spark.extensions.search_rest import (
            SearchRestServer,
        )
        from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import (
            load_table,
        )

        qsrc = None
        try:
            qsrc = load_table(spark, args.sf, "embeddings")
        except Exception:  # noqa: BLE001 - query_ids then need inline vectors
            pass
        dsrc = None
        if args.doc_meta is not None:
            from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog

            try:
                dsrc = lakelog.read(spark, args.doc_meta)
            except Exception:  # noqa: BLE001 - plain parquet dir fallback
                dsrc = spark.read.parquet(args.doc_meta)
        server = SearchRestServer(
            spark,
            bm25_root=args.bm25_root,
            ivfpq_root=args.ivfpq_root,
            ivfpq_pointer=args.ivfpq_pointer,
            query_source=qsrc,
            doc_source=dsrc,
            source_table=args.source_table,
            bm25_app_id=args.bm25_app_id,
            ivfpq_app_id=args.ivfpq_app_id,
            port=args.port,
        ).start()
        print(f"listening on {server.url} (POST /search, GET /status)")
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return 0

    if args.cmd == "pipeline":
        import datetime

        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from kafka_cdc_elasticsearch_pipeline_spark.plans.pipeline import (
            ratings_pipeline,
        )
        from kafka_cdc_elasticsearch_pipeline_spark.sources.datagen import ratings_batch

        ratings = ratings_batch(spark, args.rows).withColumn(
            "user_id",
            F.when(F.col("rating_id") % 7 == 0, 42).otherwise(F.col("user_id")),
        )
        base = datetime.datetime(2020, 1, 1)
        customers = spark.createDataFrame(
            [
                Row(
                    id=i,
                    first_name=f"First{i}",
                    last_name=f"Last{i}",
                    email=f"u{i}@example.com",
                    gender="F" if i % 2 else "M",
                    club_status=["bronze", "silver", "gold", "platinum"][i % 4],
                    comments="seed",
                    create_ts=base,
                    update_ts=base,
                    op_seq=i,
                )
                for i in range(1, 43)
            ]
        )
        dag = ratings_pipeline(ratings, customers)
        for name, df in dag.items():
            n = df.count()
            print(f"== {name}: {n} rows")
            df.show(5, truncate=False)
            if args.out:
                df.write.mode("overwrite").parquet(f"{args.out}/{name}")
                print(f"   wrote {args.out}/{name}")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
