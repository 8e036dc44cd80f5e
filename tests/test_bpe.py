"""Trained-BPE exactness: the DataFrame trainer must reproduce an
independent pure-Python BPE reference (same greedy-merge and tie-break
semantics) — the oracle role for a computation no SQL engine can replay
(iterative argmax; see operators/bpe.py docstring)."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators import bpe as B


def _py_merge_pass(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _py_bpe_train(word_freqs, num_merges, min_count=2):
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(num_merges):
        counts = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right))
        vocab = {w: _py_merge_pass(s, left, right) for w, s in vocab.items()}
    return merges, vocab


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cats chatter at the mat"),
    (2, "that cat that sat"),
    (3, "matters of the cat chat"),
]


def _word_freqs():
    freqs = {}
    for _i, text in CORPUS:
        for w in text.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = B.bpe_train(docs, "text", num_merges=10)
    want, _ = _py_bpe_train(_word_freqs(), 10)
    assert got == want
    assert len(got) == 10  # corpus is rich enough to sustain 10 merges


def test_bpe_encode_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = B.bpe_train(docs, "text", num_merges=8)
    enc = {r.doc_id: (r.n_words, r.n_pieces) for r in B.bpe_encode(docs, merges).collect()}
    _, py_vocab = _py_bpe_train(_word_freqs(), 8)
    for doc_id, text in CORPUS:
        words = text.split()
        n_pieces = sum(len(py_vocab[w]) for w in words)
        assert enc[doc_id] == (len(words), n_pieces)


def test_bpe_merge_fold_overlapping_runs(spark):
    # "aaaa" under merge (a,a): greedy single pass -> [aa, aa]
    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "syms array<string>")
    out = df.select(B._merge_pair_fold(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert out == ["aa", "aa"]
    # then merge (aa, aa) -> [aaaa]
    df2 = spark.createDataFrame([(out,)], "syms array<string>")
    out2 = df2.select(B._merge_pair_fold(F.col("syms"), "aa", "aa").alias("m")).first()["m"]
    assert out2 == ["aaaa"]


def test_bpe_train_early_stop_on_min_count(spark):
    docs = spark.createDataFrame([(0, "xy")], "doc_id long, text string")
    merges = B.bpe_train(docs, "text", num_merges=5, min_pair_count=2)
    assert merges == []  # the only pair (x,y) occurs once < min_pair_count
