"""BPE tokenizer tests: trainer determinism, greedy-encode semantics
against hand-computed merges, the shipped vocabulary, and the Spark
mapInPandas surface vs the regex proxy and the driver-side encoder."""

from pyspark.sql import functions as F

from dwc_dataframe_validator_spark.functions import bpe
from dwc_dataframe_validator_spark.operators import text


def test_train_learns_frequent_pairs():
    merges = bpe.train_bpe(["the the the cat sat on the mat"], n_merges=10)
    # (t,h) and (h,e</w>) tie at 4 occurrences; ties break
    # lexicographically so (h,e</w>) lands first, then (t,he</w>)
    # completes the word — 'the' becomes one token either way
    assert merges[:2] == [("h", "e</w>"), ("t", "he</w>")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe.encode_word("the", ranks) == ["the</w>"]


def test_train_deterministic():
    corpus = ["banana bandana cabana", "a banana and a bandana"]
    assert bpe.train_bpe(corpus, 50) == bpe.train_bpe(corpus, 50)


def test_encode_follows_merge_ranks():
    # hand-built ranks: 'h'+'e</w>' (rank 0) beats 't'+'h' (rank 1) —
    # greedy must pick the LOWEST rank first, yielding t + he</w>
    ranks = {("h", "e</w>"): 0, ("t", "h"): 1}
    assert bpe.encode_word("the", ranks) == ["t", "he</w>"]
    # reversed ranks: th merges first, and (th, e</w>) is unranked
    ranks2 = {("t", "h"): 0, ("h", "e</w>"): 1}
    assert bpe.encode_word("the", ranks2) == ["th", "e</w>"]


def test_encode_unknown_word_falls_back_to_chars():
    assert bpe.encode_word("xyz", {}) == ["x", "y", "z</w>"]
    assert bpe.token_count("xyz 7 !", {}) == 3 + 1 + 1


def test_shipped_vocab_compresses_english():
    ranks = bpe.load_merges()
    assert len(ranks) >= 50
    # 'the' must be a single token under any English BPE vocabulary
    assert bpe.encode_word("the", ranks) == ["the</w>"]
    english = "the water in the river and the wind over the bridge"
    gibberish = "qqxz vvkj wwpq zzrt qqxz vvkj wwpq zzrt qqxz vvkj"
    # real-BPE compresses in-domain text, not random consonant soup
    assert bpe.token_count(english, ranks) < bpe.token_count(gibberish, ranks)
    # character fallback bounds: pre-token count <= tokens <= char count
    assert len(bpe.pretokenize(english)) <= bpe.token_count(english, ranks)


def test_spark_surface_matches_driver_encoder(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "counting tokens in the water"),
        (3, ""),
        (4, None),
        (5, "7 cats, 9 dogs!"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in text.token_stats_bpe(df).collect()}
    ranks = bpe.load_merges()
    for doc_id, t in rows:
        want = bpe.token_count(t, ranks) if t else 0
        assert got[doc_id]["n_tokens_bpe_real"] == want
    # the regex proxy is a lower bound: every pre-token is >= 1 token
    for r in got.values():
        assert r["n_tokens_bpe_real"] >= r["n_tokens_bpe"]


def test_learn_bpe_merges_matches_single_machine(spark):
    """The distributed trainer's contract: Spark-aggregated word
    counts fed to the merge loop produce IDENTICAL merges to the
    single-machine trainer on the same texts (deterministic tie
    breaks), and the learned table actually compresses."""
    from dwc_dataframe_validator_spark.functions.bpe import (
        token_count as bpe_token_count,
        train_bpe,
    )
    from dwc_dataframe_validator_spark.operators.text import (
        learn_bpe_merges,
        token_stats_bpe_learned,
    )

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "low lower lowest slower slowest",
        "the the the cat cat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    learned = learn_bpe_merges(df, n_merges=30)
    single = train_bpe(texts, n_merges=30)
    assert learned == single

    out = {r["doc_id"]: r.asDict()
           for r in token_stats_bpe_learned(df, learned).collect()}
    ranks = {tuple(m): i for i, m in enumerate(learned)}
    for i, t in enumerate(texts):
        assert out[i]["n_tokens_bpe_real"] == bpe_token_count(t, ranks)
    # merging must never increase the token count vs zero merges
    zero = {r["doc_id"]: r["n_tokens_bpe_real"]
            for r in token_stats_bpe_learned(df, []).collect()}
    assert all(out[i]["n_tokens_bpe_real"] <= zero[i] for i in range(len(texts)))
    # vocab cap determinism: capping to a tiny vocab still runs and
    # yields a deterministic (possibly shorter) merge list
    capped = learn_bpe_merges(df, n_merges=30, max_vocab=3)
    assert capped == learn_bpe_merges(df, n_merges=30, max_vocab=3)


def test_pinned_sf001_merges_match_trainer(spark):
    """The bpe_learned_token_stats oracle replays encode over a PINNED
    merge table (registry._BPE_SF001_MERGES, learned at the driver's
    correctness scale).  Re-learn from the same data through the
    distributed trainer: any drift in trainer, pretokenizer, or data
    must fail here, loudly, before it silently desyncs the oracle."""
    from dwc_dataframe_validator_spark.registry import (
        _BPE_SF001_MERGES,
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    learned = text.learn_bpe_merges(docs, n_merges=100)
    assert [tuple(m) for m in learned] == list(_BPE_SF001_MERGES)
    # the rank-order-replay equivalence additionally needs no two
    # merges composing to the same product string (an aliased product
    # could resurrect an earlier rank after its pass)
    products = [a + b for a, b in _BPE_SF001_MERGES]
    assert len(products) == len(set(products))


def test_oracle_merge_chain_matches_encoder():
    """Word-level pin of the oracle's encode construction: the nested
    replace chain over the double-U+001F-framed symbol string yields
    the SAME token count as the Python greedy encoder for every word
    in the sf0.01 vocabulary AND for crafted repeat-run words (the
    overlap cases where a naive single-separator framing diverges)."""
    import duckdb

    from dwc_dataframe_validator_spark.registry import _BPE_SF001_MERGES

    ranks = {p: i for i, p in enumerate(_BPE_SF001_MERGES)}
    con = duckdb.connect()
    words = [
        t[0]
        for t in con.execute(
            "SELECT DISTINCT unnest(regexp_extract_all(lower(text), "
            r"'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) "
            "FROM '/root/testdata/sf0.01/documents.parquet' "
            "WHERE text IS NOT NULL"
        ).fetchall()
    ]
    # overlap torture: self-pair runs under a table where (t,o) and
    # chains over it exist; plus single chars and the EOW edge
    words += ["tototo", "ttttt", "oo", "a", "scan"]

    s = "\x1f"
    ds = s + s
    chain = "s0"
    for a, b in _BPE_SF001_MERGES:
        pat = (s + a + ds + b + s).replace("'", "''")
        rep = (s + a + b + s).replace("'", "''")
        chain = f"replace({chain}, '{pat}', '{rep}')"
    con.execute("CREATE TABLE w(word VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    got = dict(
        con.execute(
            f"""
        WITH init AS (
          SELECT word,
                 '{ds}' || array_to_string(
                    list_append(
                      regexp_split_to_array(word, '')[1:length(word)-1],
                      regexp_split_to_array(word, '')[length(word)] || '</w>'),
                    '{ds}') || '{ds}' AS s0
          FROM w)
        SELECT word,
               (length(e) - length(replace(e, '{ds}', ''))) / 2 - 1
        FROM (SELECT word, {chain} AS e FROM init)
        """
        ).fetchall()
    )
    for w in words:
        assert got[w] == len(bpe.encode_word(w, ranks)), w
