"""CLI — parity with the reference's `inspect` command
(/root/reference/main.go:12-28, single/summary.go:9-54).

    python -m inverted_index_spark inspect <store_root>
    python -m inverted_index_spark build <transcripts_parquet> <store_root>
    python -m inverted_index_spark query <store_root> term1 term2 ... [-k 10]
    python -m inverted_index_spark phrase <store_root> tok1 tok2 ...
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="inverted_index_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    s_inspect = sub.add_parser("inspect", help="per-segment stats table (U1)")
    s_inspect.add_argument("store_root")
    s_tri = sub.add_parser(
        "build-trigrams",
        help="build a trigram substring index (Code Search design; "
        "query it with `grep`)",
    )
    s_tri.add_argument("input_parquet")
    s_tri.add_argument("store_root")
    s_tri.add_argument(
        "--bucket-size", type=int, default=None,
        help="doc-bucket width; defaults to the store's pinned size, else 65536",
    )
    s_grep = sub.add_parser(
        "grep", help="substring search via a trigram index "
        "(case-insensitive; needles <3 chars fall back to a scan)"
    )
    s_grep.add_argument("store_root")
    s_grep.add_argument("input_parquet", help="the corpus the index was built over")
    s_grep.add_argument("needle")
    s_grep.add_argument(
        "--regex", action="store_true",
        help="treat NEEDLE as a regex (Java∩RE2 subset); candidates "
        "come from Cox-style required-trigram analysis when possible",
    )
    s_build = sub.add_parser("build", help="build an index segment")
    s_build.add_argument("input_parquet")
    s_build.add_argument("store_root")
    s_build.add_argument(
        "--bucket-size", type=int, default=None,
        help="doc-bucket width; defaults to the store's pinned size, else 65536",
    )
    s_build.add_argument(
        "--positions", action="store_true",
        help="also write the positional artifact (enables `phrase` queries)",
    )
    s_build.add_argument(
        "--store-text", action="store_true",
        help="also write the (doc_id, text) doc store (enables text hydration)",
    )
    s_build.add_argument(
        "--stopwords", choices=["none", "english"], default=None,
        help="analyzer chain: drop this stop set before indexing "
        "(pinned on the store; later builds and `query` re-apply it)",
    )
    s_build.add_argument(
        "--stem", action="store_true",
        help="analyzer chain: S-stem tokens before indexing (pinned "
        "on the store like --stopwords)",
    )
    s_build.add_argument(
        "--no-shuffle", action="store_true",
        help="fragment encode: no token-stream shuffle (multi-executor "
        "option; input partitions must hold disjoint doc sets; run "
        "`compact --min-files 1` afterwards to consolidate)",
    )
    s_query = sub.add_parser("query", help="ranked top-k (BM25 by default)")
    s_query.add_argument("store_root")
    s_query.add_argument("terms", nargs="+")
    s_query.add_argument("-k", type=int, default=10)
    s_query.add_argument(
        "--similarity", choices=["bm25", "classic", "dirichlet"],
        default="bm25",
        help="scoring function (Lucene setSimilarity): BM25, "
        "ClassicSimilarity TF-IDF, or LMDirichlet query likelihood",
    )
    s_phrase = sub.add_parser(
        "phrase", help="exact-phrase match over a positional index "
        "(build with --positions)"
    )
    s_phrase.add_argument("store_root")
    s_phrase.add_argument("tokens", nargs="+")
    s_phrase.add_argument(
        "--slop", type=int, default=0,
        help="each word may lag up to SLOP tokens behind its exact slot",
    )
    s_search = sub.add_parser(
        "search", help="boolean search, Lucene-classic grammar: adjacency=AND, "
        'OR keyword, (grouping), -not/NOT, "a phrase", pre*, fuzzy~ or fuzzy~2 '
        "(build with --positions for phrases)"
    )
    s_search.add_argument("store_root")
    s_search.add_argument(
        "query", help='e.g. \'(spark OR merge) -window "table hash"~2 riv*\''
    )
    s_search.add_argument(
        "--rank", action="store_true",
        help="BM25-rank the matches by the query's positive terms "
        "(prints doc_id<TAB>score, best first)",
    )
    s_search.add_argument("-k", type=int, default=10, help="top-k with --rank")
    s_search.add_argument(
        "--field", action="append", default=[], metavar="NAME=STORE_ROOT",
        help="register a field index for name:value clauses "
        "(repeatable; build with build_field_indexes)",
    )
    s_mlt = sub.add_parser(
        "mlt", help="more-like-this: rank docs similar to DOC_ID by BM25 over "
        "its most characteristic terms (build with --store-text)"
    )
    s_mlt.add_argument("store_root")
    s_mlt.add_argument("doc_id", type=int)
    s_mlt.add_argument("-k", type=int, default=10)
    s_mlt.add_argument("--n-terms", type=int, default=10)
    s_top = sub.add_parser(
        "top-terms", help="k highest-document-frequency dictionary terms"
    )
    s_top.add_argument("store_root")
    s_top.add_argument("-k", type=int, default=20)
    s_complete = sub.add_parser(
        "complete", help="df-ranked autocomplete of a dictionary prefix "
        "(ES completion suggester)"
    )
    s_complete.add_argument("store_root")
    s_complete.add_argument("prefix")
    s_complete.add_argument("-k", type=int, default=10)
    s_sig = sub.add_parser(
        "significant-terms",
        help="terms overrepresented in a query's matches vs the corpus "
        "(ES significant_terms, JLH score)",
    )
    s_sig.add_argument("store_root")
    s_sig.add_argument("query")
    s_sig.add_argument("-k", type=int, default=10)
    s_sig.add_argument("--min-doc-count", type=int, default=3)
    s_tv = sub.add_parser(
        "term-vectors",
        help="per-doc (term, tf) re-read from the index (Lucene TermVectors)",
    )
    s_tv.add_argument("store_root")
    s_tv.add_argument("doc_ids", type=int, nargs="+")
    s_explain = sub.add_parser(
        "explain",
        help="per-(doc, term) BM25 score breakdown (Lucene Explanation)",
    )
    s_explain.add_argument("store_root")
    s_explain.add_argument("terms", nargs="+")
    s_explain.add_argument("--doc", type=int, action="append", default=None,
                           help="restrict to these doc ids (repeatable)")
    s_compact = sub.add_parser(
        "compact", help="merge live segments (min_files=1 also consolidates "
        "a single fragmented segment) and delete tombstoned data"
    )
    s_compact.add_argument("store_root")
    s_compact.add_argument("--min-files", type=int, default=2)
    s_compact.add_argument("--max-files", type=int, default=8)
    s_compact.add_argument("--grace-s", type=float, default=0.0)
    s_reindex = sub.add_parser(
        "reindex", help="atomic upsert: replace docs with the parquet's "
        "rows (delete batch + new segment in one commit; older copies "
        "vanish, new content is searchable immediately)",
    )
    s_reindex.add_argument("input_parquet")
    s_reindex.add_argument("store_root")
    s_reindex.add_argument("--positions", action="store_true")
    s_reindex.add_argument("--store-text", action="store_true")
    s_delete = sub.add_parser(
        "delete", help="tombstone documents by id or by boolean query "
        "(results exclude them immediately; compact physically purges "
        "and retires the batch)"
    )
    s_delete.add_argument("store_root")
    s_delete.add_argument("doc_ids", nargs="*", type=int)
    s_delete.add_argument(
        "--query", help="tombstone every doc matching this boolean query "
        "instead of listing ids (search grammar)",
    )
    s_snap = sub.add_parser(
        "snapshots", help="list readable manifest generations (time-travel "
        "targets for --as-of; no Spark needed)"
    )
    s_snap.add_argument("store_root")
    for sp in (s_search, s_query):
        sp.add_argument(
            "--as-of", type=int, metavar="GEN",
            help="evaluate against the snapshot at this manifest generation "
            "(read-only time travel; see the snapshots subcommand)",
        )
    s_suggest = sub.add_parser(
        "suggest", help="did-you-mean: df-ranked dictionary terms within "
        "edit distance of a (mis)spelled term"
    )
    s_suggest.add_argument("store_root")
    s_suggest.add_argument(
        "term", help="misspelled term, or a whole quoted query when the "
        "probe contains spaces (phrase suggester: fuzzy candidates "
        "ranked by the positional bigram LM)"
    )
    s_suggest.add_argument("--max-edits", type=int, default=2, choices=(1, 2))
    s_suggest.add_argument("-k", type=int, default=5)
    s_pii = sub.add_parser(
        "pii-scrub", help="redact emails/IPs/phones from a parquet corpus"
    )
    s_pii.add_argument("docs_parquet")
    s_pii.add_argument("--out", help="write scrubbed parquet here (else just count)")
    s_pii.add_argument("--id-col", default="doc_id")
    s_pii.add_argument("--text-col", default="text")
    s_decon = sub.add_parser(
        "decontaminate",
        help="drop training docs sharing token n-grams with a benchmark set",
    )
    s_decon.add_argument("train_parquet")
    s_decon.add_argument("bench_parquet")
    s_decon.add_argument("--n", type=int, default=3, help="n-gram width")
    s_decon.add_argument("--out", help="write the clean corpus here (else just count)")
    s_perc = sub.add_parser(
        "percolate",
        help="reverse search: match a parquet corpus against stored queries",
    )
    s_perc.add_argument("docs_parquet")
    s_perc.add_argument(
        "--query",
        action="append",
        default=[],
        metavar="ID=QUERY",
        help="stored query (grammar string), repeatable",
    )
    s_perc.add_argument("--id-col", default="doc_id")
    s_perc.add_argument("--text-col", default="text")
    s_perc.add_argument("--out", help="write (doc_id, query_id) parquet here")
    s_qual = sub.add_parser(
        "quality",
        help="Gopher + C4 quality verdicts over a parquet corpus",
    )
    s_qual.add_argument("docs_parquet")
    s_qual.add_argument("--id-col", default="doc_id")
    s_qual.add_argument("--text-col", default="text")
    s_qual.add_argument(
        "--out", help="write per-doc signals (gopher keep + c4 keep) here"
    )
    s_mix = sub.add_parser(
        "mix", help="downsample a corpus to target per-source proportions"
    )
    s_mix.add_argument("docs_parquet")
    s_mix.add_argument(
        "--target",
        action="append",
        default=[],
        metavar="SOURCE=WEIGHT",
        help="target mixing weight (repeatable; ratios matter, not sum)",
    )
    s_mix.add_argument("--strata-col", default="source")
    s_mix.add_argument("--id-col", default="doc_id")
    s_mix.add_argument("--out", help="write the mixed corpus here")
    s_kmeans = sub.add_parser(
        "kmeans", help="distributed Lloyd k-means over an embedding column"
    )
    s_kmeans.add_argument("embeddings_parquet")
    s_kmeans.add_argument("-k", type=int, default=8)
    s_kmeans.add_argument("--iters", type=int, default=5)
    s_kmeans.add_argument("--id-col", default="vec_id")
    s_kmeans.add_argument("--vec-col", default="embedding")
    s_kmeans.add_argument("--out", help="write (vec_id, cluster, dist) parquet here")
    args = p.parse_args(argv)

    # corpus-level commands take parquet paths, not a segment store
    if args.cmd in (
        "pii-scrub", "decontaminate", "kmeans", "percolate", "quality", "mix",
    ):
        from pyspark.sql import functions as F

        from inverted_index_spark import get_spark

        spark = get_spark("ii-cli")
        spark.sparkContext.setLogLevel("ERROR")
        if args.cmd == "pii-scrub":
            from inverted_index_spark.functions.pii import pii_scrub, pii_stats

            docs = spark.read.parquet(args.docs_parquet)
            stats = pii_stats(docs, args.id_col, args.text_col)
            agg = stats.agg(
                F.sum("n_emails").alias("emails"),
                F.sum("n_ips").alias("ips"),
                F.sum("n_phones").alias("phones"),
                F.sum(F.col("any_pii").cast("long")).alias("docs_with_pii"),
                F.count("*").alias("docs"),
            ).collect()[0]
            print(
                f"{agg['docs']} docs, {agg['docs_with_pii']} with PII "
                f"({agg['emails']} emails, {agg['ips']} IPs, {agg['phones']} phones)"
            )
            if args.out:
                pii_scrub(docs, args.id_col, args.text_col).write.parquet(args.out)
                print(f"scrubbed corpus -> {args.out}")
            return 0
        if args.cmd == "decontaminate":
            from inverted_index_spark.operators.contamination import (
                decontaminate,
                ngram_contamination,
            )

            train = spark.read.parquet(args.train_parquet)
            bench = spark.read.parquet(args.bench_parquet)
            flagged = ngram_contamination(train, bench, n=args.n).count()
            print(f"{flagged} training docs overlap the benchmark (n={args.n})")
            if args.out:
                decontaminate(train, bench, n=args.n).write.parquet(args.out)
                print(f"clean corpus -> {args.out}")
            return 0
        if args.cmd == "percolate":
            from inverted_index_spark.operators.percolate import percolate

            if not args.query:
                p.error("percolate requires at least one --query ID=QUERY")
            stored = {}
            for q in args.query:
                qid, _, expr = q.partition("=")
                if not expr:
                    p.error(f"--query needs ID=QUERY form, got {q!r}")
                stored[qid] = expr
            docs = spark.read.parquet(args.docs_parquet)
            out = percolate(
                spark, docs, stored, text_col=args.text_col, id_col=args.id_col
            )
            if args.out:
                out.write.parquet(args.out)
                print(f"matches -> {args.out}")
                # summarize from the just-written parquet — re-running
                # the whole percolation plan for the summary would
                # double the command's runtime on a large corpus
                out = spark.read.parquet(args.out)
            for row in (
                out.groupBy("query_id")
                .agg(F.count("*").alias("n_docs"))
                .orderBy("query_id")
                .collect()
            ):
                print(f"{row['query_id']}\t{row['n_docs']} docs")
            return 0
        if args.cmd == "quality":
            from inverted_index_spark.functions.textstats import gopher_filter
            from inverted_index_spark.operators.curation import c4_clean

            docs = spark.read.parquet(args.docs_parquet)
            g = gopher_filter(docs, args.id_col, args.text_col).select(
                "doc_id", F.col("keep").alias("gopher_keep")
            )
            c = c4_clean(docs, args.id_col, args.text_col).select(
                "doc_id", F.col("keep").alias("c4_keep")
            )
            both = g.join(c, "doc_id")
            if args.out:
                both.write.parquet(args.out)
                print(f"verdicts -> {args.out}")
                both = spark.read.parquet(args.out)  # summary reads the write back
            agg = both.agg(
                F.count("*").alias("docs"),
                F.sum(F.col("gopher_keep").cast("long")).alias("gopher"),
                F.sum(F.col("c4_keep").cast("long")).alias("c4"),
                F.sum(
                    (F.col("gopher_keep") & F.col("c4_keep")).cast("long")
                ).alias("both"),
            ).collect()[0]
            print(
                f"{agg['docs']} docs: gopher keeps {agg['gopher']}, "
                f"c4 keeps {agg['c4']}, both keep {agg['both']}"
            )
            return 0
        if args.cmd == "mix":
            from inverted_index_spark.operators.mixing import mix_corpus

            if not args.target:
                p.error("mix requires at least one --target SOURCE=WEIGHT")
            targets = {}
            for t in args.target:
                src, _, w = t.partition("=")
                try:
                    targets[src] = float(w)
                except ValueError:
                    p.error(f"--target needs SOURCE=WEIGHT form, got {t!r}")
            docs = spark.read.parquet(args.docs_parquet)
            mixed = mix_corpus(
                docs, targets, strata_col=args.strata_col, id_col=args.id_col
            )
            if args.out:
                mixed.write.parquet(args.out)
                print(f"mixed corpus -> {args.out}")
                mixed = spark.read.parquet(args.out)  # summary reads the write back
            for row in (
                mixed.groupBy(args.strata_col)
                .agg(F.count("*").alias("n"))
                .orderBy(args.strata_col)
                .collect()
            ):
                print(f"{row[args.strata_col]}\t{row['n']} docs")
            return 0
        from inverted_index_spark.operators.kmeans import kmeans_clusters

        emb = spark.read.parquet(args.embeddings_parquet)
        out = kmeans_clusters(
            emb, k=args.k, iters=args.iters, id_col=args.id_col, vec_col=args.vec_col
        )
        if args.out:
            out.write.parquet(args.out)
            print(f"assignments -> {args.out}")
            out = spark.read.parquet(args.out)  # summary reads the write back
        for row in (
            out.groupBy("cluster").agg(F.count("*").alias("n")).orderBy("cluster").collect()
        ):
            print(f"cluster {row['cluster']}\t{row['n']}")
        return 0

    from inverted_index_spark.sources.store import SegmentStore

    store = SegmentStore(args.store_root)

    if args.cmd == "snapshots":
        gens = store.generations()
        if not gens:
            print("no committed generations")
            return 1
        cur = store.current_generation()
        for g in gens:
            print(f"gen {g}{'  (current)' if g == cur else ''}")
        return 0

    if args.cmd == "inspect":
        # driver-side only — no Spark session needed (manifest is the
        # summary, like the reference's footer walk)
        m = store.summary()
        if not len(m):
            print("empty index directory")
            return 1
        cols = [
            "segment_id", "status", "n_terms", "n_postings", "n_docs",
            "bytes", "min_doc", "max_doc", "skew_ratio",
        ]
        print(m[cols].to_string(index=False))
        return 0

    from inverted_index_spark import get_spark

    spark = get_spark("ii-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "build-trigrams":
        from inverted_index_spark.operators.substring import (
            build_trigram_index,
        )

        docs = spark.read.parquet(args.input_parquet)
        if "doc_id" not in docs.columns:
            from inverted_index_spark.operators.docids import mint_doc_ids

            docs = mint_doc_ids(docs)
        bucket = args.bucket_size or store.pinned_bucket_size() or (1 << 16)
        sid = build_trigram_index(spark, docs, store, bucket_size=bucket)
        print(f"committed trigram segment {sid}")
        return 0
    if args.cmd == "grep":
        from inverted_index_spark.operators.substring import (
            regex_search, substring_search,
        )

        docs = spark.read.parquet(args.input_parquet)
        if "doc_id" not in docs.columns:
            from inverted_index_spark.operators.docids import mint_doc_ids

            docs = mint_doc_ids(docs)
        fn = regex_search if args.regex else substring_search
        for row in fn(spark, store, args.needle, docs).collect():
            print(row["doc_id"])
        return 0
    if args.cmd == "build":
        from inverted_index_spark.operators.build import build_index

        docs = spark.read.parquet(args.input_parquet)
        if "doc_id" not in docs.columns:
            from inverted_index_spark.operators.docids import mint_doc_ids

            docs = mint_doc_ids(docs)
        from inverted_index_spark.functions.analyzer import (
            ENGLISH_STOPWORDS, Analyzer,
        )

        analyzer = Analyzer.load(args.store_root)
        if args.stopwords or args.stem:
            requested = Analyzer(
                stopwords=ENGLISH_STOPWORDS
                if args.stopwords == "english"
                else frozenset(),
                stem=args.stem,
            )
            if analyzer is not None and analyzer != requested:
                raise SystemExit(
                    f"store pins a different analyzer ({analyzer}); "
                    "build without --stopwords/--stem to reuse it"
                )
            if analyzer is None and len(store.live_segments()):
                raise SystemExit(
                    "store already holds segments built WITHOUT an "
                    "analyzer; pinning one now would mix term spaces — "
                    "rebuild into a fresh store"
                )
            analyzer = requested
            analyzer.save(args.store_root)
        text_col, store_text_col = "text", None
        if analyzer is not None:
            # index the analyzed stream, hydrate the ORIGINAL text
            from pyspark.sql import functions as _F

            docs = docs.withColumn("_analyzed", analyzer.expr(_F.col("text")))
            text_col, store_text_col = "_analyzed", "text"
        bucket_size = args.bucket_size or store.pinned_bucket_size() or (1 << 16)
        sid = build_index(
            spark, docs, store, bucket_size=bucket_size,
            shuffle=not args.no_shuffle, positions=args.positions,
            store_text=args.store_text,
            text_col=text_col, store_text_col=store_text_col,
        )
        print(f"committed segment {sid}")
        return 0
    if args.cmd == "delete":
        if args.query and args.doc_ids:
            raise SystemExit("give doc ids OR --query, not both")
        if args.query:
            from inverted_index_spark.operators.boolean import delete_by_query

            del_id = delete_by_query(spark, store, args.query)
            if del_id is None:
                print("no documents matched; nothing tombstoned")
                return 0
            print(f"committed delete batch {del_id} (query: {args.query!r})")
            return 0
        if not args.doc_ids:
            raise SystemExit("give doc ids or --query")
        del_id = store.delete_docs(spark, args.doc_ids)
        print(f"committed delete batch {del_id} ({len(set(args.doc_ids))} ids)")
        return 0
    if args.cmd == "reindex":
        from inverted_index_spark.operators.build import reindex_docs

        docs = spark.read.parquet(args.input_parquet)
        if "doc_id" not in docs.columns:
            raise SystemExit(
                "reindex input must carry doc_id (the ids to supersede)"
            )
        from inverted_index_spark.functions.analyzer import Analyzer

        text_col, store_text_col = "text", None
        analyzer = Analyzer.load(args.store_root)
        if analyzer is not None:
            # replacements must live in the store's analyzed term space
            from pyspark.sql import functions as _F

            docs = docs.withColumn("_analyzed", analyzer.expr(_F.col("text")))
            text_col, store_text_col = "_analyzed", "text"
        sid = reindex_docs(
            spark, docs, store,
            positions=args.positions, store_text=args.store_text,
            text_col=text_col, store_text_col=store_text_col,
        )
        print(f"committed reindex segment {sid}")
        return 0
    if args.cmd == "search":
        from inverted_index_spark.operators.boolean import (
            evaluate, parse_query, ranked_topk,
        )

        if args.as_of is not None:
            store = store.at(args.as_of)
        field_stores = None
        if args.field:
            field_stores = {}
            for spec in args.field:
                name, _, froot = spec.partition("=")
                if not froot:
                    raise SystemExit(f"--field wants NAME=STORE_ROOT, got {spec!r}")
                field_stores[name] = SegmentStore(froot)
        from inverted_index_spark.functions.analyzer import Analyzer

        tree = parse_query(args.query)
        analyzer = Analyzer.load(args.store_root)
        if analyzer is not None:
            # map the query into the store's pinned analyzed term space
            tree = analyzer.rewrite(tree)
            if tree is None:
                return 0  # the whole query analyzed away (stopwords)
        if args.rank:
            for row in ranked_topk(
                spark, store, tree, k=args.k, field_stores=field_stores
            ).collect():
                print(f"{row['doc_id']}\t{row['score']:.6f}")
            return 0
        for row in evaluate(
            spark, store, tree, field_stores=field_stores
        ).collect():
            print(row["doc_id"])
        return 0
    if args.cmd == "phrase":
        from inverted_index_spark.functions.analyzer import Analyzer
        from inverted_index_spark.operators.positions import phrase_match

        tokens = args.tokens
        analyzer = Analyzer.load(args.store_root)
        if analyzer is not None:
            tokens = analyzer.terms(" ".join(tokens))
            if not tokens:
                return 0
        for row in phrase_match(spark, store, tokens, slop=args.slop).collect():
            print(f"{row['doc_id']}\t{row['n_matches']}")
        return 0
    if args.cmd == "mlt":
        from inverted_index_spark.operators.bm25 import more_like_this

        rows = more_like_this(
            spark, store, args.doc_id, n_terms=args.n_terms, k=args.k
        ).collect()
        for row in rows:
            print(f"{row['doc_id']}\t{row['score']:.6f}")
        return 0
    if args.cmd == "suggest":
        from inverted_index_spark.functions.tokenizer import tokenize_text

        # dispatch on the TOKENIZER's reading, not whitespace — a
        # punctuation-joined probe ('quick,browm') is a phrase too
        if len(tokenize_text(args.term)) > 1:
            from inverted_index_spark.operators.phrase_suggest import (
                phrase_suggest,
            )

            rows = phrase_suggest(
                spark, store, args.term,
                k=args.k, max_edits=args.max_edits,
            ).collect()
            for row in rows:
                print(f"{row['suggestion']}\t{row['score']:.6f}")
            return 0
        from inverted_index_spark.operators.query import spell_suggest

        for row in spell_suggest(
            spark, store, args.term, max_edits=args.max_edits, k=args.k
        ).collect():
            print(f"{row['term']}\t{row['df']}")
        return 0
    if args.cmd == "top-terms":
        from inverted_index_spark.operators.query import top_terms

        for row in top_terms(spark, store, k=args.k).collect():
            print(f"{row['term']}\t{row['df']}")
        return 0
    if args.cmd == "complete":
        from inverted_index_spark.operators.query import complete_terms

        for row in complete_terms(spark, store, args.prefix, k=args.k).collect():
            print(f"{row['term']}\t{row['df']}")
        return 0
    if args.cmd == "significant-terms":
        from inverted_index_spark.functions.analyzer import Analyzer
        from inverted_index_spark.operators.aggregations import significant_terms
        from inverted_index_spark.operators.boolean import parse_query

        q = parse_query(args.query)
        analyzer = Analyzer.load(args.store_root)
        if analyzer is not None:
            q = analyzer.rewrite(q)
            if q is None:
                return 0
        for row in significant_terms(
            spark, store, q, k=args.k, min_doc_count=args.min_doc_count
        ).collect():
            print(
                f"{row['term']}\t{row['fg_df']}\t{row['bg_df']}\t{row['score']:.6f}"
            )
        return 0
    if args.cmd == "term-vectors":
        from inverted_index_spark.operators.aggregations import term_vectors

        for row in term_vectors(spark, store, args.doc_ids).collect():
            print(f"{row['doc_id']}\t{row['term']}\t{row['tf']}")
        return 0
    if args.cmd == "explain":
        from inverted_index_spark.functions.analyzer import Analyzer
        from inverted_index_spark.operators.aggregations import bm25_explain

        terms = args.terms
        analyzer = Analyzer.load(args.store_root)
        if analyzer is not None:
            # explain must see the same term space query/search rank in
            terms = analyzer.terms(" ".join(terms))
            if not terms:
                return 0
        for row in bm25_explain(spark, store, terms, doc_ids=args.doc).collect():
            print(
                f"{row['doc_id']}\t{row['term']}\ttf={row['tf']}\tdl={row['dl']}"
                f"\tdf={row['df']}\tidf={row['idf']:.6f}"
                f"\ttf_norm={row['tf_norm']:.6f}\tcontrib={row['contribution']:.6f}"
            )
        return 0
    if args.cmd == "query":
        from inverted_index_spark.functions.analyzer import Analyzer
        from inverted_index_spark.operators.search import Searcher

        if args.as_of is not None:
            store = store.at(args.as_of)
        terms = args.terms
        analyzer = Analyzer.load(args.store_root)
        if analyzer is not None:
            # the store's pinned analyzer maps query terms into the
            # indexed term space (ES `match` semantics); stopwords
            # analyze away entirely
            terms = analyzer.terms(" ".join(terms))
            if not terms:
                return 0
        if args.similarity != "bm25":
            from inverted_index_spark.operators.bm25 import similarity_topk

            rows = similarity_topk(
                spark, store, terms, k=args.k, similarity=args.similarity
            ).collect()
        else:
            searcher = Searcher(spark, store).open()
            rows = searcher.topk(terms, args.k).collect()
        for row in rows:
            print(f"{row['doc_id']}\t{row['score']:.6f}")
        return 0
    if args.cmd == "compact":
        from inverted_index_spark.operators.merge import merge_segments

        sid = merge_segments(spark, store, args.min_files, args.max_files)
        deleted = store.cleanup(grace_s=args.grace_s)
        print(f"merged -> {sid or '(nothing to merge)'}; deleted {len(deleted)} segments")
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
