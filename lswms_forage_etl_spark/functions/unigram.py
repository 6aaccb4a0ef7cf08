"""Unigram-LM (SentencePiece-style) subword tokenizer training
(VERDICT r12 missing #2): the other mainstream subword family next to
BPE (Kudo 2018 — T5 and most multilingual models train THIS, not
merges). Where BPE grows a vocab bottom-up by merging, unigram starts
from an over-complete substring seed vocabulary and PRUNES it down
under an EM objective: segment the corpus under current piece
probabilities, re-estimate piece counts, drop the least-useful pieces,
repeat.

This implementation is the engine's exact-integer member of that
family — hard-EM (Viterbi E-step) with whole-bit (bitlen) costs, so
the full training run and the final encode replay bit-for-bit in the
DuckDB oracle:

* piece cost in whole bits: cost(p) = bitlen(T) - bitlen(c_p) (the
  same length(bin(n)) twin as operators/lm.py); unknown single chars
  cost bitlen(T) + UNIGRAM_PENALTY_BITS, unknown multi-char pieces
  are not candidates at all.
* Viterbi segmentation: dp over word positions with lookback
  SEED_MAX_LEN; candidates ranked by (total cost, piece count, start
  index) — the start-index tie-break prefers the LONGEST final piece
  and makes every segmentation unique, which is what lets the SQL
  replay carry the chosen segmentation as a string.
* E/M: usage counts are frequency-weighted piece counts over the
  Viterbi segmentations of the DISTINCT-word table.
* prune: after each E/M round drop `prune_per_round` multi-char
  pieces by (usage ASC, piece ASC); single-char pieces are never
  pruned (the alphabet guarantees segmentability).
* training words longer than `word_max_len` are excluded (the
  SentencePiece trainer's own max-length input filters; documented
  convention, applied identically on both engines); ENCODING such a
  word falls back to one token per character.

Scale shape (the bpe_train_scaled precedent, functions/bpe.py:409
applied verbatim): the only corpus-sized work is the distributed
word-frequency aggregation; the collected table is vocabulary-bound
and capped top-1M by (n DESC, word ASC), and every E/M/prune step is
per-word over that bounded table — driver-side Python with exact ints.
Distributed ENCODE is one Arrow pass with per-batch memoization
(bpe_encode_count_udf shape): no shuffle, rides executor counts at
100 TB. The chained-CTE oracle exists only for gate-scale replay; all
its DP CTEs are MATERIALIZED (the round-12 ann_pca_power lesson:
DuckDB inlines multiply-referenced CTEs by default, doubling the
upstream tree per step).
"""

from __future__ import annotations

from lswms_forage_etl_spark.functions.bpe import (
    _ASCII_LOWER,
    _ASCII_WS,
    bpe_word_frequencies,
    words_sql,
)

UNIGRAM_PENALTY_BITS = 4
"""Unknown-single-char surcharge in whole log2 units (the
operators/lm.py stupid-backoff convention)."""

SEED_MAX_LEN = 4
"""Maximum piece length — seeds are all substrings up to this length,
so the Viterbi lookback is bounded by it."""


def _bl(n: int) -> int:
    return n.bit_length() if n > 0 else 0


def unigram_viterbi(word: str, cost: dict, unk: int,
                    max_len: int = SEED_MAX_LEN) -> list[str]:
    """Min-cost segmentation of one word under integer piece costs.
    dp[j] = best (cost, n_pieces, start_of_last_piece) reaching j;
    candidate order (cost, np, i) makes the argmin — and therefore the
    segmentation — unique. Unknown single chars cost `unk`; unknown
    multi-char pieces are not candidates."""
    L = len(word)
    # dp[j] = (cost, np, i) ; seg reconstructed by backtracking i
    dp: list[tuple | None] = [None] * (L + 1)
    dp[0] = (0, 0, -1)
    for j in range(1, L + 1):
        best = None
        for i in range(max(0, j - max_len), j):
            if dp[i] is None:
                continue
            piece = word[i:j]
            pc = cost.get(piece)
            if pc is None:
                if j - i != 1:
                    continue
                pc = unk
            key = (dp[i][0] + pc, dp[i][1] + 1, i)
            if best is None or key < best:
                best = key
        dp[j] = best
    out: list[str] = []
    j = L
    while j > 0:
        i = dp[j][2]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def unigram_train_driver(freqs, seed_multi: int = 64,
                         rounds: int = 2, prune_per_round: int = 12,
                         word_max_len: int = 16,
                         penalty: int = UNIGRAM_PENALTY_BITS):
    """Driver-side hard-EM unigram training over a collected (word, n)
    frequency table. Returns (vocab_rows, prune_log, t_bits):
    vocab_rows = [(piece, n_used, cost_bits)] for the FINAL vocab
    (cost_bits are the final pass's costs — derived from the counts
    AFTER the last prune; n_used is what that pass measured);
    prune_log = [(round, piece, usage)] in drop order; t_bits =
    bitlen of the final pass's total count (the unk base — encode
    needs it to reuse the same cost epoch)."""
    from collections import Counter

    words = [(w, n) for w, n in freqs if len(w) <= word_max_len]
    sub: Counter = Counter()
    for w, n in words:
        L = len(w)
        for i in range(L):
            for le in range(1, min(SEED_MAX_LEN, L - i) + 1):
                sub[w[i:i + le]] += n
    singles = sorted(p for p in sub if len(p) == 1)
    multis = sorted((p for p in sub if len(p) > 1),
                    key=lambda p: (-sub[p], p))[:seed_multi]
    vocab = {p: sub[p] for p in singles}
    vocab.update({p: sub[p] for p in multis})

    def em_pass(counts):
        T = sum(counts.values())
        cost = {p: _bl(T) - _bl(c) for p, c in counts.items()}
        unk = _bl(T) + penalty
        usage: Counter = Counter()
        for w, n in words:
            for p in unigram_viterbi(w, cost, unk):
                usage[p] += n
        return cost, usage

    log = []
    for r in range(1, rounds + 1):
        _, usage = em_pass(vocab)
        drop = sorted((p for p in vocab if len(p) > 1),
                      key=lambda p: (usage.get(p, 0), p))[:prune_per_round]
        for p in drop:
            log.append((r, p, usage.get(p, 0)))
        vocab = {p: usage.get(p, 0) for p in vocab if p not in set(drop)}
    cost, usage = em_pass(vocab)
    rows = [(p, int(usage.get(p, 0)), int(cost[p]))
            for p in sorted(vocab)]
    return rows, log, _bl(sum(vocab.values()))


def unigram_train_scaled(spark, docs, text_col: str = "text",
                         seed_multi: int = 64, rounds: int = 2,
                         prune_per_round: int = 12,
                         max_words: int = 1 << 20):
    """Distributed frequency build -> driver EM/prune loop -> final
    vocab as a DataFrame (piece, n_used, cost_bits)."""
    rows, _, _ = unigram_train_driver(
        bpe_word_frequencies(docs, text_col, max_words),
        seed_multi=seed_multi, rounds=rounds,
        prune_per_round=prune_per_round)
    from lswms_forage_etl_spark.lifecycle import local_df
    return local_df(spark, rows,
                    "piece string, n_used long, cost_bits int")


def unigram_encode_count_udf(vocab_rows, t_bits: int,
                             penalty: int = UNIGRAM_PENALTY_BITS,
                             word_max_len: int = 16):
    """Arrow-batched per-doc token counter under a trained unigram
    vocab: Viterbi piece count per word (memoized per batch), words
    longer than `word_max_len` fall back to one token per char. Costs
    are the trainer's OWN final-pass cost_bits (same epoch as the
    oracle's finF DP — recomputing costs from n_used would shift one
    EM epoch and diverge); the (piece -> cost) dict rides inside the
    serialized UDF — vocabulary-bound, broadcast by value
    (bpe_encode_count_udf shape)."""
    from pyspark.sql.functions import pandas_udf

    cost = {p: cb for p, _, cb in vocab_rows}
    unk = t_bits + penalty

    def word_tokens(word: str, cache: dict) -> int:
        hit = cache.get(word)
        if hit is not None:
            return hit
        if len(word) > word_max_len:
            n = len(word)
        else:
            n = len(unigram_viterbi(word, cost, unk))
        cache[word] = n
        return n

    @pandas_udf("long")
    def _count(col):
        cache: dict = {}

        def doc_tokens(text):
            if text is None:
                return 0
            return sum(
                word_tokens(w, cache)
                for w in _ASCII_WS.split(text.translate(_ASCII_LOWER))
                if w)

        return col.map(doc_tokens).astype("int64")

    return _count


# ---------------------------------------------------------------------------
# DuckDB oracle generators: the training loop and the encode unrolled
# as a MATERIALIZED CTE chain. One Viterbi pass = `word_max_len` DP
# steps; step j considers the up-to-SEED_MAX_LEN pieces ending at j via
# a UNION ALL over start positions, keeps the (cost, np, i) argmin per
# word, and CARRIES the chosen segmentation as a '|'-joined string so
# the M-step is a plain unnest+sum.
# ---------------------------------------------------------------------------

def _dp_pass(tag: str, vocab_cte: str, word_max_len: int,
             penalty: int) -> str:
    """CTE fragment: Viterbi-segment wtrain under `vocab_cte` (piece,
    c). Defines k{tag} (piece costs), u{tag} (unk cost), d{tag}_j DP
    steps and fin{tag} (word, n, np, seg)."""
    parts = [f"""
        t{tag} AS MATERIALIZED (
          SELECT CAST(sum(c) AS BIGINT) AS t FROM {vocab_cte}),
        k{tag} AS MATERIALIZED (
          SELECT piece,
                 CAST(length(bin(t)) - CASE WHEN c <= 0 THEN 0
                      ELSE length(bin(c)) END AS BIGINT) AS cost
          FROM {vocab_cte}, t{tag}),
        u{tag} AS MATERIALIZED (
          SELECT CAST(length(bin(t)) + {penalty} AS BIGINT) AS unk
          FROM t{tag}),
        d{tag}_0 AS MATERIALIZED (
          SELECT word, n, CAST(0 AS BIGINT) AS cost, 0 AS np,
                 '' AS seg
          FROM wtrain)"""]
    for j in range(1, word_max_len + 1):
        branches = []
        for i in range(max(0, j - SEED_MAX_LEN), j):
            le = j - i
            pc = ("coalesce(k.cost, u.unk)" if le == 1 else "k.cost")
            branches.append(f"""
              SELECT d.word, d.n, {i} AS i,
                     d.cost + {pc} AS cost, d.np + 1 AS np,
                     d.seg || '|' || substr(d.word, {i + 1}, {le})
                       AS seg
              FROM d{tag}_{i} d
              LEFT JOIN k{tag} k
                ON k.piece = substr(d.word, {i + 1}, {le})
              CROSS JOIN u{tag} u
              WHERE length(d.word) >= {j}""")
        u = " UNION ALL ".join(branches)
        parts.append(f"""
        d{tag}_{j} AS MATERIALIZED (
          SELECT word, n, cost, np, seg FROM (
            SELECT *, row_number() OVER (PARTITION BY word
                     ORDER BY cost, np, i) AS rn
            FROM ({u}) WHERE cost IS NOT NULL)
          WHERE rn = 1)""")
    fins = " UNION ALL ".join(
        f"SELECT word, n, np, seg FROM d{tag}_{j} "
        f"WHERE length(word) = {j}"
        for j in range(1, word_max_len + 1))
    parts.append(f"""
        fin{tag} AS MATERIALIZED ({fins}),
        usage{tag} AS MATERIALIZED (
          SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM (
            SELECT n, unnest(list_filter(string_split(seg, '|'),
                     x -> x <> '')) AS piece
            FROM fin{tag})
          GROUP BY 1)""")
    return ",".join(parts)


def _train_ctes(doc_source: str, text_col: str, seed_multi: int,
                rounds: int, prune_per_round: int, word_max_len: int,
                penalty: int) -> tuple[str, str]:
    """(cte_chain, final_vocab_cte_name): the full training replay.
    Round r vocab CTE is v{r}; the final E/M pass runs under tag 'F'."""
    # the top-1M word cap is REPLICATED (ADVICE r13): Spark trains on
    # bpe_word_frequencies' deterministic (n DESC, word) top-(1<<20)
    # collect and THEN filters word length; past 1M distinct words the
    # engines would otherwise silently diverge. Same tie-total order,
    # so capped sets are identical on both engines at any scale.
    parts = [f"""{words_sql(doc_source, text_col)},
        wtrain AS MATERIALIZED (
          SELECT word, n FROM (
            SELECT word, n FROM words
            ORDER BY n DESC, word LIMIT {1 << 20})
          WHERE length(word) <= {word_max_len}),
        pos AS (SELECT word, n,
                       CAST(unnest(range(1, length(word) + 1)) AS INT)
                         AS i
                FROM wtrain),
        sub AS MATERIALIZED (
          SELECT substr(word, i, CAST(l.l AS INT)) AS piece,
                 CAST(sum(n) AS BIGINT) AS c
          FROM pos, range(1, {SEED_MAX_LEN + 1}) l(l)
          WHERE i + CAST(l.l AS INT) <= length(word) + 1
          GROUP BY 1),
        v0 AS MATERIALIZED (
          SELECT piece, c FROM sub WHERE length(piece) = 1
          UNION ALL
          SELECT piece, c FROM (
            SELECT piece, c FROM sub WHERE length(piece) > 1
            ORDER BY c DESC, piece LIMIT {seed_multi}))"""]
    prev = "v0"
    for r in range(1, rounds + 1):
        tag = str(r)
        parts.append(_dp_pass(tag, prev, word_max_len, penalty))
        parts.append(f"""
        drop{r} AS MATERIALIZED (
          SELECT piece FROM (
            SELECT v.piece, coalesce(us.c, 0) AS uc
            FROM {prev} v LEFT JOIN usage{tag} us USING (piece)
            WHERE length(v.piece) > 1)
          ORDER BY uc, piece LIMIT {prune_per_round}),
        v{r} AS MATERIALIZED (
          SELECT v.piece, coalesce(us.c, 0) AS c
          FROM {prev} v LEFT JOIN usage{tag} us USING (piece)
          WHERE v.piece NOT IN (SELECT piece FROM drop{r}))""")
        prev = f"v{r}"
    parts.append(_dp_pass("F", prev, word_max_len, penalty))
    return ",".join(parts), prev


def unigram_train_sql(doc_source: str = "documents",
                      text_col: str = "text", seed_multi: int = 64,
                      rounds: int = 2, prune_per_round: int = 12,
                      word_max_len: int = 16,
                      penalty: int = UNIGRAM_PENALTY_BITS) -> str:
    """DuckDB replay of unigram_train_scaled: full SELECT returning
    (piece, n_used, cost_bits)."""
    ctes, vfin = _train_ctes(doc_source, text_col, seed_multi, rounds,
                             prune_per_round, word_max_len, penalty)
    return f"""
        WITH {ctes}
        SELECT v.piece, CAST(coalesce(us.c, 0) AS BIGINT) AS n_used,
               CAST(k.cost AS INT) AS cost_bits
        FROM {vfin} v
        LEFT JOIN usageF us USING (piece)
        JOIN kF k USING (piece)
    """


def unigram_encode_sql(doc_source: str = "documents",
                       text_col: str = "text", seed_multi: int = 64,
                       rounds: int = 2, prune_per_round: int = 12,
                       word_max_len: int = 16,
                       penalty: int = UNIGRAM_PENALTY_BITS) -> str:
    """DuckDB replay of the distributed encode: (doc_id, n_tokens)
    for EVERY document (0 for empty). Token counts per distinct word
    come from the final-pass DP (finF); words longer than
    `word_max_len` count length(word) tokens."""
    ctes, _ = _train_ctes(doc_source, text_col, seed_multi, rounds,
                          prune_per_round, word_max_len, penalty)
    from lswms_forage_etl_spark.functions.bpe import (
        _WS_CLASS_RE2 as _RE2, _LOWER, _UPPER)
    return f"""
        WITH {ctes},
        wtok AS (
          SELECT word, CAST(np AS BIGINT) AS toks FROM finF
          UNION ALL
          SELECT word, CAST(length(word) AS BIGINT) AS toks
          FROM words WHERE length(word) > {word_max_len}),
        docw AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(
                   translate({text_col}, '{_UPPER}', '{_LOWER}'),
                   '{_RE2}'), x -> x <> '')) AS word
          FROM {doc_source}),
        docwc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
                  FROM docw GROUP BY 1, 2),
        per AS (SELECT doc_id,
                       CAST(sum(cnt * toks) AS BIGINT) AS n_tokens
                FROM docwc JOIN wtok USING (word) GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens
        FROM {doc_source} d LEFT JOIN per p USING (doc_id)
    """
