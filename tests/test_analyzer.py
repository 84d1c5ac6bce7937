"""Analyzer chain (stop filter + S-stemmer): JVM/Python twin parity,
tf/dl preservation, and the indexed-text == query-terms contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from inverted_index_spark.functions.analyzer import (
    ENGLISH_STOPWORDS,
    Analyzer,
    stem_s,
)
from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.bm25 import bm25_topk
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.sources.store import SegmentStore


def test_stem_s_rules():
    cases = {
        # < 4 chars: untouched (incl. bare 's' words)
        "as": "as", "is": "is", "ies": "ies", "s": "s",
        # ies -> y
        "queries": "query", "stories": "story", "ties": "ty",
        # eies / aies guard
        "eies": "eies",
        # es -> e (drop s)
        "merges": "merge", "tables": "table", "indexes": "indexe",
        # aes / ees / oes guard
        "trees": "trees", "goes": "goes", "antennaes": "antennaes",
        # plain s
        "sparks": "spark", "windows": "window",
        # us / ss guard
        "corpus": "corpus", "class": "class",
        # no suffix
        "spark": "spark",
    }
    for w, want in cases.items():
        assert stem_s(w) == want, (w, stem_s(w), want)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abceiosuy_19", min_size=1, max_size=8),
        min_size=0,
        max_size=6,
    )
)
def test_jvm_python_analyzer_parity(spark, words):
    """The JVM token expression equals the scalar twin on adversarial
    suffix-heavy alphabets (ies/es/s/us/ss/aes/ees/oes all reachable)."""
    an = Analyzer(stopwords=frozenset({"es", "sies", "a"}), stem=True)
    text = " ".join(words)
    got = spark.range(1).select(
        an.tokens(F.lit(text)).alias("t")
    ).first()["t"]
    assert got == an.terms(text)


def test_stopwords_preserve_tf_dl(spark):
    """Stop filtering keeps duplicates and order (filter, never
    array_except): tf of survivors is exact."""
    an = Analyzer(stopwords=ENGLISH_STOPWORDS)
    text = "the spark and the spark of a window"
    assert an.terms(text) == ["spark", "spark", "window"]
    got = spark.range(1).select(an.expr(F.lit(text)).alias("x")).first()["x"]
    assert got == "spark spark window"


def test_analyzed_index_end_to_end(spark, tmp_path):
    """Index built over apply()-ed text answers queries analyzed with
    terms() — plural/singular and stopword variants hit the same docs."""
    an = Analyzer(stopwords=ENGLISH_STOPWORDS, stem=True)
    docs = spark.createDataFrame(
        [
            (0, "The sparks are merging the tables"),
            (1, "a spark merges a table"),
            (2, "windows and indexes"),
            (3, "entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    store = SegmentStore(str(tmp_path / "an_idx"))
    build_index(spark, an.apply(docs), store, bucket_size=2)
    from inverted_index_spark.operators.query import read_all_values

    # "sparks" and "spark" both analyze to 'spark'; docs 0 and 1 match
    for q in ("The Sparks", "a spark"):
        got = [r["doc_id"] for r in
               read_all_values(spark, store, an.terms(q)).collect()]
        assert got == [0, 1], (q, got)
    # ranked retrieval over the analyzed space: merging/merges -> 'merging'?
    # no — 'merging' has no s-suffix; 'merges' -> 'merge'. Both docs say
    # merge-ish words but only doc 1's 'merges' stems to 'merge'.
    top = [r["doc_id"] for r in
           bm25_topk(spark, store, an.terms("table merges"), k=4).collect()]
    assert top[0] == 1
    # dl reflects the post-stop token stream (doc 0: sparks merging tables)
    stats = {r["doc_id"]: r["dl"] for r in store.read_docstats(spark).collect()}
    assert stats[0] == len(an.terms("The sparks are merging the tables")) == 3


def test_analyzer_save_load_conflict(tmp_path):
    an = Analyzer(stopwords=frozenset({"the"}), stem=True)
    an.save(str(tmp_path / "idx"))
    assert Analyzer.load(str(tmp_path / "idx")) == an
    an.save(str(tmp_path / "idx"))  # idempotent re-pin is fine
    import pytest

    with pytest.raises(ValueError, match="already pins"):
        Analyzer(stem=False).save(str(tmp_path / "idx"))
    assert Analyzer.load(str(tmp_path / "other")) is None


def test_cli_analyzed_build_and_query(spark, tmp_path, capsys):
    """CLI pins the analyzer at build; `query` analyzes terms through
    it (plural surface forms hit stemmed index terms), and a second
    build without flags reuses the pinned chain."""
    from inverted_index_spark.__main__ import main

    docs = spark.createDataFrame(
        [
            (0, "the sparks and the tables"),
            (1, "a spark merges"),
            (2, "entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "in.parquet"))
    idx = str(tmp_path / "idx")
    rc = main(
        ["build", str(tmp_path / "in.parquet"), idx,
         "--bucket-size", "4", "--stopwords", "english", "--stem"]
    )
    assert rc == 0
    capsys.readouterr()
    # surface plural analyzes to the indexed stem; stopwords vanish
    rc = main(["query", idx, "the", "Sparks", "-k", "5"])
    assert rc == 0
    hit_ids = {
        int(line.split("\t")[0])
        for line in capsys.readouterr().out.strip().splitlines()
    }
    assert hit_ids == {0, 1}
    # all-stopword query: no terms left, clean exit, no output
    rc = main(["query", idx, "the", "and", "-k", "5"])
    assert rc == 0
    assert capsys.readouterr().out == ""
    # conflicting analyzer on a later build is refused
    import pytest

    with pytest.raises(SystemExit, match="different analyzer"):
        main(["build", str(tmp_path / "in.parquet"), idx, "--stem"])
    # flag-less later build silently reuses the pinned chain
    docs2 = spark.createDataFrame(
        [(3, "more sparks here")], "doc_id long, text string"
    )
    docs2.write.parquet(str(tmp_path / "in2.parquet"))
    rc = main(["build", str(tmp_path / "in2.parquet"), idx, "--bucket-size", "4"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["query", idx, "sparks", "-k", "5"])
    assert rc == 0
    hit_ids = {
        int(line.split("\t")[0])
        for line in capsys.readouterr().out.strip().splitlines()
    }
    assert hit_ids == {0, 1, 3}


def test_rewrite_query_tree():
    """Tree rewrite: stopword leaves drop, terms/phrases stem,
    multi-term queries stay unanalyzed, operators collapse cleanly."""
    from inverted_index_spark.operators.boolean import (
        And, Boost, Fuzzy, Not, Or, Phrase, Prefix, Term, parse_query,
    )

    an = Analyzer(stopwords=ENGLISH_STOPWORDS, stem=True)
    assert an.rewrite(Term("sparks")) == Term("spark")
    assert an.rewrite(Term("the")) is None
    assert an.rewrite(Phrase(["the", "sparks", "merge"])) == Phrase(
        ["spark", "merge"]
    )
    assert an.rewrite(Phrase(["the", "a"])) is None
    # MultiTermQuery nodes are unanalyzed (Lucene contract)
    assert an.rewrite(Prefix("quer")) == Prefix("quer")
    assert an.rewrite(Fuzzy("tables", 1)) == Fuzzy("tables", 1)
    # operators: dropped clauses vanish; singletons unwrap
    assert an.rewrite(And(Term("the"), Term("sparks"))) == Term("spark")
    assert an.rewrite(Or(Term("the"), Term("a"))) is None
    # pure-negative And after drops is invalid -> None
    assert an.rewrite(And(Term("the"), Not(Term("sparks")))) is None
    assert an.rewrite(Boost(Term("the"), 2.0)) is None
    got = an.rewrite(
        Or(Term("sparks"), Term("the"), Term("tables"),
           minimum_should_match=3)
    )
    assert got == Or(Term("spark"), Term("table"), minimum_should_match=2)
    # grammar round-trip: parse then rewrite
    t = an.rewrite(parse_query('sparks AND "the merging tables"'))
    assert t == And(Term("spark"), Phrase(["merging", "table"]))


def test_cli_analyzed_search_and_phrase(spark, tmp_path, capsys):
    """`search` and `phrase` on an analyzer-pinned store analyze their
    input — surface forms with stopwords/plurals match."""
    from inverted_index_spark.__main__ import main

    docs = spark.createDataFrame(
        [
            (0, "the sparks merge the tables"),
            (1, "a spark merges a window"),
            (2, "entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "in.parquet"))
    idx = str(tmp_path / "idx")
    assert main(
        ["build", str(tmp_path / "in.parquet"), idx, "--bucket-size", "4",
         "--positions", "--stopwords", "english", "--stem"]
    ) == 0
    capsys.readouterr()
    assert main(["search", idx, "the sparks AND merges"]) == 0
    assert [int(x) for x in capsys.readouterr().out.split()] == [0, 1]
    # all-stopword query: clean empty
    assert main(["search", idx, "the OR a"]) == 0
    assert capsys.readouterr().out == ""
    # phrase: 'the sparks merge' -> ['spark', 'merge'] adjacency
    assert main(["phrase", idx, "the", "sparks", "merge"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert [int(line.split("\t")[0]) for line in out] == [0, 1]


def test_cli_refuses_pin_on_raw_store(spark, tmp_path, capsys):
    """Pinning an analyzer onto a store that already holds raw-built
    segments would silently mix term spaces — refused (review fix)."""
    from inverted_index_spark.__main__ import main

    docs = spark.createDataFrame(
        [(0, "some queries here")], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "in.parquet"))
    idx = str(tmp_path / "idx")
    assert main(["build", str(tmp_path / "in.parquet"), idx,
                 "--bucket-size", "4"]) == 0
    capsys.readouterr()
    import pytest

    with pytest.raises(SystemExit, match="mix term spaces"):
        main(["build", str(tmp_path / "in.parquet"), idx, "--stem"])


def test_cli_analyzed_store_hydrates_original_text(spark, tmp_path, capsys):
    """An analyzer pipeline indexes the analyzed stream but the doc
    store keeps the ORIGINAL text; reindex stays in the analyzed term
    space (review fixes)."""
    from inverted_index_spark.__main__ import main
    from inverted_index_spark.operators.search import Searcher
    from inverted_index_spark.sources.store import SegmentStore

    docs = spark.createDataFrame(
        [(0, "The Sparks are merging Tables"), (1, "a window here")],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "in.parquet"))
    idx = str(tmp_path / "idx")
    assert main(
        ["build", str(tmp_path / "in.parquet"), idx, "--bucket-size", "4",
         "--store-text", "--stopwords", "english", "--stem"]
    ) == 0
    capsys.readouterr()
    store = SegmentStore(idx)
    s = Searcher(spark, store).open()
    hits = s.topk(["spark"], 5)
    hydrated = {
        r["doc_id"]: r["text"] for r in s.fetch_text(hits).collect()
    }
    assert hydrated[0] == "The Sparks are merging Tables"  # original
    # reindex doc 1 with plural surface forms; the analyzed query space
    # must still match it afterwards
    upd = spark.createDataFrame(
        [(1, "many sparks and tables")], "doc_id long, text string"
    )
    upd.write.parquet(str(tmp_path / "upd.parquet"))
    assert main(["reindex", str(tmp_path / "upd.parquet"), idx,
                 "--store-text"]) == 0
    capsys.readouterr()
    assert main(["query", idx, "sparks", "-k", "5"]) == 0
    got = {
        int(line.split("\t")[0])
        for line in capsys.readouterr().out.strip().splitlines()
    }
    assert got == {0, 1}


def test_noop_analyzer_is_identity(spark):
    an = Analyzer()
    text = "The Sparks are MERGING"
    assert an.terms(text) == tokenize_text(text)
    got = spark.range(1).select(an.expr(F.lit(text)).alias("x")).first()["x"]
    assert got == " ".join(tokenize_text(text))
