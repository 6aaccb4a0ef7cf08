"""Unigram-LM (SentencePiece-style) trainer/encoder unit tests
(functions/unigram.py): Viterbi optimality vs brute force, prune
invariants, determinism, and Spark-encode agreement with the local
replay."""

from __future__ import annotations

import itertools

from lswms_forage_etl_spark.functions.unigram import (
    SEED_MAX_LEN,
    unigram_encode_count_udf,
    unigram_train_driver,
    unigram_viterbi,
)


def _brute_best(word, cost, unk, max_len=SEED_MAX_LEN):
    """Enumerate every segmentation of a short word; return the best
    (cost, n_pieces) and the set of segmentations achieving it."""
    n = len(word)
    best = None
    best_segs = []
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[pos[i]:pos[i + 1]] for i in range(len(pos) - 1)]
        if any(len(p) > max_len for p in pieces):
            continue
        tot = 0
        ok = True
        for p in pieces:
            c = cost.get(p)
            if c is None:
                if len(p) != 1:
                    ok = False
                    break
                c = unk
            tot += c
        if not ok:
            continue
        key = (tot, len(pieces))
        if best is None or key < best:
            best, best_segs = key, [pieces]
        elif key == best:
            best_segs.append(pieces)
    return best, best_segs


def test_viterbi_is_optimal_vs_bruteforce():
    cost = {"a": 3, "b": 4, "ab": 5, "ba": 2, "aba": 9, "bab": 1,
            "abab": 7, "c": 6}
    unk = 11
    for word in ("ababab", "abcba", "aaaa", "zzz", "babab", "cab"):
        got = unigram_viterbi(word, cost, unk)
        assert "".join(got) == word
        gk = (sum(cost.get(p, unk) for p in got), len(got))
        bk, segs = _brute_best(word, cost, unk)
        assert gk == bk, (word, got, segs)
        # the (cost, np, start-index) tie-break returns one of the
        # optimal segmentations
        assert got in segs


def test_viterbi_unknown_multichar_never_used():
    # only singles known: the segmentation must be all singles
    cost = {"x": 1, "y": 1}
    assert unigram_viterbi("xyxy", cost, 5) == ["x", "y", "x", "y"]
    # unknown char falls back to unk-cost single
    assert unigram_viterbi("xqy", cost, 5) == ["x", "q", "y"]


def test_train_driver_invariants():
    freqs = [("the", 50), ("cat", 20), ("that", 15), ("hat", 10),
             ("concatenate", 3), ("t", 1)]
    rows, log, t_bits = unigram_train_driver(
        freqs, seed_multi=16, rounds=2, prune_per_round=4)
    pieces = {p for p, _, _ in rows}
    # singles never pruned: every char of every training word survives
    chars = {c for w, _ in freqs for c in w}
    assert chars <= pieces
    # exactly 2 rounds x 4 prunes logged, all multi-char
    assert len(log) == 8 and all(len(p) > 1 for _, p, _ in log)
    # pruned pieces are gone from the final vocab
    assert not {p for _, p, _ in log} & pieces
    # vocab arithmetic: singles + (seed_multi - total pruned)
    assert len(pieces) == len(chars) + 16 - 8
    assert t_bits > 0
    # determinism under input order permutation (driver sorts nothing
    # order-dependent)
    rows2, log2, t2 = unigram_train_driver(
        list(reversed(freqs)), seed_multi=16, rounds=2,
        prune_per_round=4)
    assert (rows, log, t_bits) == (rows2, log2, t2)


def test_train_word_max_len_filter():
    # a >16-char word contributes nothing to training
    freqs = [("short", 5), ("x" * 20, 1000)]
    rows, _, _ = unigram_train_driver(freqs, seed_multi=8, rounds=1,
                                      prune_per_round=2)
    assert "x" not in {p for p, _, _ in rows}


def test_spark_encode_matches_local_replay(spark):
    docs = [(0, "the cat sat on the mat"),
            (1, "concatenation of the categories"),
            (2, ""), (3, None),
            (4, "a " + "y" * 20 + " b")]       # long-word fallback
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from lswms_forage_etl_spark.functions.bpe import (
        bpe_word_frequencies)
    rows, _, t_bits = unigram_train_driver(
        bpe_word_frequencies(df), seed_multi=16, rounds=2,
        prune_per_round=4)
    cnt = unigram_encode_count_udf(rows, t_bits)
    got = {r["doc_id"]: r["n_tokens"]
           for r in df.select("doc_id", cnt(df.text).alias("n_tokens"))
           .collect()}
    cost = {p: cb for p, _, cb in rows}
    unk = t_bits + 4

    def local(text):
        if text is None:
            return 0
        return sum(
            len(w) if len(w) > 16 else len(unigram_viterbi(w, cost, unk))
            for w in text.lower().split() if w)

    assert got == {d: local(t) for d, t in docs}
    assert got[2] == 0 and got[3] == 0
    assert got[4] >= 20 + 2   # 20 chars fallback + at least a, b
