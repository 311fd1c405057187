"""Command-line interface mirroring the reference's two-command shape.

Reference: ``pdfsearch build_index -d DIR`` and ``pdfsearch serve -p PORT``
(cli/flags.go:16-26, main.go:35-63). Ours swaps the serving layer for a
``search`` command that runs one MATCH query and prints the reference's JSON
result shape (routes/routes.go:105-107 / database/models.go:18-24), plus a
``gen`` command that synthesizes the deterministic web-pages corpus
(FIXTURES.md) since our input is a table, not a directory of PDFs.

Cluster usage (north_rule "ships via spark-submit --py-files"):

    python scripts/make_pyfiles.py                      # -> dist/pdfsearch_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/pdfsearch_spark.zip \
        dist/cli_entry.py build_index -d s3://pages -o s3://index \
        --shards 4096 --master submit

``--master submit`` defers master + sizing confs to spark-submit; locally the
default is ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import argparse
import json
import sys

from .session import get_spark


def _add_master(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--master",
        default=None,
        help="Spark master; 'submit' defers to spark-submit's --master (cluster mode)",
    )


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="pdfsearch_spark",
        description="PySpark-native full-text index + BM25 search engine",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    g = sub.add_parser("gen", help="synthesize the deterministic web-pages corpus")
    g.add_argument("-n", "--num-docs", type=int, required=True)
    g.add_argument("-o", "--output", required=True, help="output parquet dir")
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--partitions", type=int, default=None)
    _add_master(g)

    b = sub.add_parser(
        "build_index", help="build the inverted index (reference: build_index -d DIR)"
    )
    b.add_argument(
        "-d", "--pages", required=True, help="input pages table (parquet dir), "
        "schema (url string, warc_ts timestamp, html binary, text string, lang string)"
    )
    b.add_argument("-o", "--index", required=True, help="output index dir")
    b.add_argument(
        "--shards", type=int, default=None,
        help="posting shards (default: index_build.SHARD_DEFAULT; "
        "size so one shard's postings fit an executor)",
    )
    b.add_argument(
        "--resume", action="store_true",
        help="complete a partial build from the _build_state manifest",
    )
    _add_master(b)

    r = sub.add_parser(
        "refresh", help="append docs newer than the index watermark as a new segment"
    )
    r.add_argument("-d", "--pages", required=True, help="input pages table (parquet dir)")
    r.add_argument("-i", "--index", required=True, help="existing index dir")
    _add_master(r)

    c = sub.add_parser(
        "compact", help="merge all segments into one (offline maintenance)"
    )
    c.add_argument("-i", "--index", required=True, help="existing index dir")
    _add_master(c)

    s = sub.add_parser("search", help="run one MATCH query (reference: GET /search)")
    s.add_argument("-i", "--index", required=True, help="index dir from build_index")
    s.add_argument("-q", "--query", required=True, help="FTS5 MATCH query string")
    s.add_argument(
        "-k", "--limit", type=int, default=200,
        help="top-k cap (reference LIMIT 200, database/database.go:184)",
    )
    s.add_argument(
        "--book", default=None,
        help="comma-separated doc_ids (the reference's intended book= filter, Q6)",
    )
    s.add_argument("--no-snippets", action="store_true")
    _add_master(s)

    return ap


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    spark = get_spark(app_name=f"pdfsearch_spark-{args.command}", master=args.master)

    if args.command == "gen":
        from .corpus import web_pages_df

        df = web_pages_df(spark, args.num_docs, seed=args.seed, partitions=args.partitions)
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"generated_docs": args.num_docs, "output": args.output}))
        return 0

    if args.command == "build_index":
        from .index_build import SHARD_DEFAULT, build_index, resume_build

        pages = spark.read.parquet(args.pages)
        n_shards = args.shards or SHARD_DEFAULT
        fn = resume_build if args.resume else build_index
        metrics = fn(spark, pages, args.index, n_shards=n_shards)
        print(json.dumps(metrics))
        return 0

    if args.command == "refresh":
        from .index_build import refresh_index

        metrics = refresh_index(spark, spark.read.parquet(args.pages), args.index)
        print(json.dumps(metrics))
        return 0

    if args.command == "compact":
        from .index_build import compact_index

        print(json.dumps(compact_index(spark, args.index)))
        return 0

    if args.command == "search":
        from .query.parser import QuerySyntaxError
        from .search import SearchEngine

        engine = SearchEngine(spark, args.index)
        book_ids = [int(x) for x in args.book.split(",")] if args.book else None
        try:
            rows = engine.search(
                args.query, k=args.limit, book_ids=book_ids,
                with_snippets=not args.no_snippets,
            ).collect()
        except QuerySyntaxError as e:
            # reference surfaces grammar errors as HTTP 400 (routes/routes.go:96-103)
            print(json.dumps({"message": str(e)}), file=sys.stderr)
            return 1
        # reference JSON shape: SearchResult (database/models.go:18-24)
        out = [
            {
                "FileID": r["doc_id"],
                "PageNum": r["part"],
                "Title": r["title"],
                "Text": r["text"],
                "BaseName": r["base_name"],
                "Score": r["score"],
            }
            for r in rows
        ]
        print(json.dumps(out))
        return 0

    return 2  # unreachable; argparse enforces the command set


if __name__ == "__main__":
    sys.exit(main())
