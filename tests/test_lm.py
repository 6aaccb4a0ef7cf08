"""Unit tests for the LM corpus-filter operators (operators/lm.py):
every value is exact integer arithmetic, so the Spark results must
equal a pure-Python replay bit for bit."""

from __future__ import annotations

import hashlib

from lswms_forage_etl_spark.lifecycle import release_tracked
from lswms_forage_etl_spark.operators.lm import (
    BACKOFF_PENALTY_BITS,
    CLS_WEIGHT_SPAN,
    bigram_lm_surprisal,
    dsir_importance,
    hashed_linear_quality,
)

DOCS = [
    # (doc_id, text, lang, source)
    (0, "the cat sat on the mat", "en", "ref"),
    (1, "the cat ran on the mat", "en", "ref"),
    (2, "the dog sat on a log", "en", "web"),
    (3, "zx qq zx qq zx", "en", "web"),          # mostly unseen bigrams
    (4, "  The   CAT sat  ", "en", "web"),       # case/space normalize
    (5, "le chat dort", "fr", "web"),            # lang absent from train
    (6, "the the the the", "en", "ref"),         # repeat bigrams kept
]
SCHEMA = "doc_id long, text string, lang string, source string"
TRAIN = ["ref"]


def _toks(s):
    return [t for t in s.strip().lower().split() if t]


def _bl(n):
    return n.bit_length()


def _u32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_surprisal(docs, train_sources, penalty=BACKOFF_PENALTY_BITS):
    bg = []
    for did, text, lang, src in docs:
        t = _toks(text)
        for a, b in zip(t, t[1:]):
            bg.append((did, lang, src, a, b))
    c2, c1, c1u, tot = {}, {}, {}, {}
    for _, lang, src, a, b in bg:
        if src in train_sources:
            c2[(lang, a, b)] = c2.get((lang, a, b), 0) + 1
            c1[(lang, a)] = c1.get((lang, a), 0) + 1
            c1u[(lang, b)] = c1u.get((lang, b), 0) + 1
            tot[lang] = tot.get(lang, 0) + 1
    per = {}
    for did, lang, _, a, b in bg:
        if (lang, a, b) in c2:
            s = _bl(c1[(lang, a)]) - _bl(c2[(lang, a, b)])
        elif (lang, b) in c1u:
            s = _bl(tot[lang]) - _bl(c1u[(lang, b)]) + penalty
        elif lang in tot:
            s = _bl(tot[lang]) + penalty
        else:
            s = 1 + penalty
        n, ss = per.get((did, lang), (0, 0))
        per[(did, lang)] = (n + 1, ss + s)
    rows = {k: (n, ss * 1_000_000 // n) for k, (n, ss) in per.items()}
    # ntile(3) per lang over (surprisal_ppm, doc_id)
    buckets = {}
    langs = {lang for _, lang in rows}
    for lang in langs:
        ordered = sorted((ppm, did) for (did, lg), (_, ppm)
                         in rows.items() if lg == lang)
        n = len(ordered)
        base, extra = divmod(n, 3)
        names, i = ["head", "middle", "tail"], 0
        for tile in range(3):
            size = base + (1 if tile < extra else 0)
            for _ in range(size):
                if i < n:
                    buckets[(ordered[i][1], lang)] = names[tile]
                    i += 1
    return {k: (n, ppm, buckets[k]) for k, (n, ppm) in rows.items()}


def test_bigram_surprisal_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {(r["doc_id"], r["lang"]):
           (r["n_bigrams"], r["surprisal_ppm"], r["bucket"])
           for r in bigram_lm_surprisal(df, TRAIN).collect()}
    release_tracked()
    assert got == _py_surprisal(DOCS, TRAIN)
    # reference-slice docs score lower (head-ier) than the gibberish doc
    assert got[(0, "en")][1] < got[(3, "en")][1]


def test_bigram_surprisal_backoff_and_oov(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    out = {r["doc_id"]: r for r in
           bigram_lm_surprisal(df, TRAIN).collect()}
    release_tracked()
    # doc 5: its lang has no train rows at all -> every bigram costs
    # the last-ditch constant 1 + penalty
    assert out[5]["surprisal_ppm"] == (1 + BACKOFF_PENALTY_BITS) * 1_000_000
    # doc 3: 'zx qq' bigrams unseen AND qq/zx OOV as continuations ->
    # bitlen(T_en) + penalty each
    t_en = sum(1 for did, text, lang, src in DOCS if src == "ref"
               for _ in zip(_toks(text), _toks(text)[1:]))
    assert out[3]["surprisal_ppm"] == (_bl(t_en)
                                       + BACKOFF_PENALTY_BITS) * 1_000_000


def _py_classifier(docs):
    half = (CLS_WEIGHT_SPAN - 1) // 2
    exp = {}
    for did, text, _, src in docs:
        t = _toks(text)
        feats = [f"u|{x}" for x in t] + [f"b|{a} {b}"
                                         for a, b in zip(t, t[1:])]
        score = sum(_u32("w|" + f) % CLS_WEIGHT_SPAN - half
                    for f in feats)
        exp[did] = (src, len(feats), score,
                    "keep" if score > 0 else "drop")
    return exp


def test_hashed_linear_quality_matches_python_replay(spark):
    docs = DOCS + [(7, "solo", "en", "web")]   # single token: no bigrams
    df = spark.createDataFrame(docs, SCHEMA)
    got = {r["doc_id"]: (r["source"], r["n_features"],
                         r["score_sum"], r["label"])
           for r in hashed_linear_quality(df).collect()}
    release_tracked()
    assert got == _py_classifier(docs)
    assert got[7][1] == 1   # one unigram feature, zero bigrams


def _py_dsir(docs, target_sources, num_buckets=1024):
    occ = []
    for did, text, _, src in docs:
        t = _toks(text)
        feats = [f"u|{x}" for x in t] + [f"b|{a} {b}"
                                         for a, b in zip(t, t[1:])]
        for f in feats:
            occ.append((did, src, _u32("d|" + f) % num_buckets))
    cr, ct = {}, {}
    for _, src, b in occ:
        cr[b] = cr.get(b, 0) + 1
        if src in target_sources:
            ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    s = {b: (_bl(ct.get(b, 0) + 1) - _bl(tt))
         - (_bl(cr[b] + 1) - _bl(tr)) for b in cr}
    exp = {}
    for did, src, b in occ:
        n, w = exp.get(did, (0, 0))
        exp[did] = (n + 1, w + s[b])
    return {did: (n, w, w > 0) for did, (n, w) in exp.items()}


def test_dsir_importance_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {r["doc_id"]: (r["n_features"], r["weight_qbits"],
                         r["selected"])
           for r in dsir_importance(df, ["ref"]).collect()}
    release_tracked()
    assert got == _py_dsir(DOCS, ["ref"])


def test_bigram_surprisal_scaled_matches_python_replay(spark):
    from lswms_forage_etl_spark.operators.lm import (
        bigram_lm_surprisal_scaled)
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {(r["doc_id"], r["lang"]):
           (r["n_bigrams"], r["surprisal_ppm"], r["bucket"])
           for r in bigram_lm_surprisal_scaled(
               df, TRAIN, bin_width=50000).collect()}
    release_tracked()
    # same scores as the exact form, sketched tertile thresholds
    exact = _py_surprisal(DOCS, TRAIN)
    scores = {k: (n, ppm) for k, (n, ppm, _) in exact.items()}
    per_lang = {}
    for (did, lang), (_, ppm) in scores.items():
        per_lang.setdefault(lang, []).append(ppm)
    thr = {}
    for lang, vals in per_lang.items():
        bins = sorted(v // 50000 for v in vals)
        n = len(bins)
        def cut(p_ppm):
            needed = (n * p_ppm + 999999) // 1000000
            return bins[needed - 1] * 50000
        thr[lang] = (cut(333334), cut(666667))
    for (did, lang), (n, ppm) in scores.items():
        t1, t2 = thr[lang]
        bucket = ("head" if ppm <= t1
                  else "middle" if ppm <= t2 else "tail")
        assert got[(did, lang)] == (n, ppm, bucket), (did, lang)
    assert set(got) == set(scores)


def _py_kn(docs, train_sources, penalty=BACKOFF_PENALTY_BITS):
    """Pure-Python replay of trigram_kn_surprisal (backoff KN, D=1,
    whole-bit log2, lower orders from trigram TYPE counts)."""
    tg = []
    for did, text, lang, src in docs:
        t = _toks(text)
        for a, b, c in zip(t, t[1:], t[2:]):
            tg.append((did, lang, src, a, b, c))
    c3 = {}
    for _, lang, src, a, b, c in tg:
        if src in train_sources:
            c3[(lang, a, b, c)] = c3.get((lang, a, b, c), 0) + 1
    ctx2, cont2, mid_n1p, mid_n2t, cont1, tot = {}, {}, {}, {}, {}, {}
    n2t_sets = {}
    for (lang, a, b, c), n in c3.items():
        c12, n3t = ctx2.get((lang, a, b), (0, 0))
        ctx2[(lang, a, b)] = (c12 + n, n3t + 1)
        cont2[(lang, b, c)] = cont2.get((lang, b, c), 0) + 1
        mid_n1p[(lang, b)] = mid_n1p.get((lang, b), 0) + 1
        n2t_sets.setdefault((lang, b), set()).add(c)
    for k, s in n2t_sets.items():
        mid_n2t[k] = len(s)
    for (lang, b, c) in cont2:
        cont1[(lang, c)] = cont1.get((lang, c), 0) + 1
        tot[lang] = tot.get(lang, 0) + 1
    per = {}
    for did, lang, _, a, b, c in tg:
        if (lang, c) in cont1:
            s1 = _bl(tot[lang]) - _bl(cont1[(lang, c)])
        elif lang in tot:
            s1 = _bl(tot[lang]) + penalty
        else:
            s1 = 1 + penalty
        if (lang, b, c) in cont2:
            s2 = _bl(mid_n1p[(lang, b)]) - _bl(cont2[(lang, b, c)] - 1)
        else:
            a2 = (_bl(mid_n1p[(lang, b)]) - _bl(mid_n2t[(lang, b)])
                  if (lang, b) in mid_n1p else 0)
            s2 = a2 + s1
        if (lang, a, b, c) in c3:
            c12, _ = ctx2[(lang, a, b)]
            s = _bl(c12) - _bl(c3[(lang, a, b, c)] - 1)
        else:
            a3 = (_bl(ctx2[(lang, a, b)][0]) - _bl(ctx2[(lang, a, b)][1])
                  if (lang, a, b) in ctx2 else 0)
            s = a3 + s2
        n, ss = per.get((did, lang), (0, 0))
        per[(did, lang)] = (n + 1, ss + s)
    return {k: (n, ss * 1_000_000 // n) for k, (n, ss) in per.items()}


def test_trigram_kn_matches_python_replay(spark):
    from lswms_forage_etl_spark.operators.lm import trigram_kn_surprisal
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {(r["doc_id"], r["lang"]): (r["n_trigrams"], r["surprisal_ppm"])
           for r in trigram_kn_surprisal(df, TRAIN).collect()}
    release_tracked()
    want = _py_kn(DOCS, TRAIN)
    assert got == want
    # 2-token docs contribute no trigrams -> absent from output
    assert all(n >= 1 for n, _ in got.values())
    # in-train doc scores below the gibberish doc
    assert got[(0, "en")][1] < got[(3, "en")][1]


def _py_kn5(docs, train_sources, penalty=BACKOFF_PENALTY_BITS):
    """Pure-Python replay of fivegram_kn_surprisal (backoff KN, D=1,
    whole-bit log2, each lower order's TYPE table from the next
    order's distinct keys)."""
    from collections import defaultdict
    ng = []
    for did, text, lang, src in docs:
        t = _toks(text)
        for g in zip(t, t[1:], t[2:], t[3:], t[4:]):
            ng.append((did, lang, src, g))
    c5 = defaultdict(int)
    for _, lang, src, g in ng:
        if src in train_sources:
            c5[(lang,) + g] += 1
    ctx4 = defaultdict(lambda: [0, 0])
    cont4 = defaultdict(int)
    for (lang, a, b, c, d, e), n in c5.items():
        ctx4[(lang, a, b, c, d)][0] += n
        ctx4[(lang, a, b, c, d)][1] += 1
        cont4[(lang, b, c, d, e)] += 1
    mid4 = defaultdict(lambda: [0, 0])
    cont3 = defaultdict(int)
    for (lang, b, c, d, e), n in cont4.items():
        mid4[(lang, b, c, d)][0] += n
        mid4[(lang, b, c, d)][1] += 1
        cont3[(lang, c, d, e)] += 1
    mid3 = defaultdict(lambda: [0, 0])
    cont2 = defaultdict(int)
    for (lang, c, d, e), n in cont3.items():
        mid3[(lang, c, d)][0] += n
        mid3[(lang, c, d)][1] += 1
        cont2[(lang, d, e)] += 1
    mid2 = defaultdict(lambda: [0, 0])
    cont1 = defaultdict(int)
    tot = defaultdict(int)
    for (lang, d, e), n in cont2.items():
        mid2[(lang, d)][0] += n
        mid2[(lang, d)][1] += 1
        cont1[(lang, e)] += 1
        tot[lang] += 1
    per = {}
    for did, lang, _, (a, b, c, d, e) in ng:
        if (lang, e) in cont1:
            s1 = _bl(tot[lang]) - _bl(cont1[(lang, e)])
        elif lang in tot:
            s1 = _bl(tot[lang]) + penalty
        else:
            s1 = 1 + penalty
        if (lang, d, e) in cont2:
            s2 = (_bl(mid2[(lang, d)][0])
                  - _bl(cont2[(lang, d, e)] - 1))
        else:
            a2 = (_bl(mid2[(lang, d)][0]) - _bl(mid2[(lang, d)][1])
                  if (lang, d) in mid2 else 0)
            s2 = a2 + s1
        if (lang, c, d, e) in cont3:
            s3 = (_bl(mid3[(lang, c, d)][0])
                  - _bl(cont3[(lang, c, d, e)] - 1))
        else:
            a3 = (_bl(mid3[(lang, c, d)][0])
                  - _bl(mid3[(lang, c, d)][1])
                  if (lang, c, d) in mid3 else 0)
            s3 = a3 + s2
        if (lang, b, c, d, e) in cont4:
            s4 = (_bl(mid4[(lang, b, c, d)][0])
                  - _bl(cont4[(lang, b, c, d, e)] - 1))
        else:
            a4 = (_bl(mid4[(lang, b, c, d)][0])
                  - _bl(mid4[(lang, b, c, d)][1])
                  if (lang, b, c, d) in mid4 else 0)
            s4 = a4 + s3
        if (lang, a, b, c, d, e) in c5:
            s = (_bl(ctx4[(lang, a, b, c, d)][0])
                 - _bl(c5[(lang, a, b, c, d, e)] - 1))
        else:
            a5 = (_bl(ctx4[(lang, a, b, c, d)][0])
                  - _bl(ctx4[(lang, a, b, c, d)][1])
                  if (lang, a, b, c, d) in ctx4 else 0)
            s = a5 + s4
        n, ss = per.get((did, lang), (0, 0))
        per[(did, lang)] = (n + 1, ss + s)
    return {k: (n, ss * 1_000_000 // n) for k, (n, ss) in per.items()}


FIVEGRAM_DOCS = [
    (0, "the cat sat on the mat today", "en", "ref"),
    (1, "the cat sat on the rug today", "en", "ref"),
    (2, "the cat sat on the mat again and again", "en", "web"),
    (3, "zz qq zz qq zz qq", "en", "web"),
    (4, "the cat sat", "en", "web"),               # <5 tokens: no rows
    (5, "le chat dort sur le tapis", "fr", "web"),  # lang absent
    (6, "the the the the the the", "en", "ref"),   # repeats kept
]


def test_fivegram_kn_matches_python_replay(spark):
    from lswms_forage_etl_spark.operators.lm import fivegram_kn_surprisal
    df = spark.createDataFrame(FIVEGRAM_DOCS, SCHEMA)
    got = {(r["doc_id"], r["lang"]):
           (r["n_fivegrams"], r["surprisal_ppm"])
           for r in fivegram_kn_surprisal(df, TRAIN).collect()}
    release_tracked()
    want = _py_kn5(FIVEGRAM_DOCS, TRAIN)
    assert got == want
    assert (4, "en") not in got                    # <5 tokens dropped
    # in-train doc scores below the gibberish doc
    assert got[(0, "en")][1] < got[(3, "en")][1]


def test_fivegram_kn_hand_computed_backoff_chain(spark):
    """Pin all five backoff levels on a hand-computed micro-corpus:
    train 'a b c d e a b c d f' gives six count-1 5-grams,
    ctx4(a,b,c,d) = (2 tokens, 2 types), every mid table (2, 2)
    (alpha = 0 at orders 5..2), nn = 6 continuation pair types."""
    from lswms_forage_etl_spark.operators.lm import fivegram_kn_surprisal
    docs = [(0, "a b c d e a b c d f", "en", "ref"),
            (1, "a b c d e", "en", "web"),  # seen: bl(2) - bl(0) = 2
            (2, "a b c d x", "en", "web"),  # alphas 0, OOV x:
                                            # bl(6) + 4 = 7
            (3, "p q r s t", "de", "web")]  # lang absent: 1 + 4 = 5
    df = spark.createDataFrame(docs, SCHEMA)
    got = {r["doc_id"]: (r["n_fivegrams"], r["surprisal_ppm"])
           for r in fivegram_kn_surprisal(df, TRAIN).collect()}
    release_tracked()
    assert got[1] == (1, 2_000_000)
    assert got[2] == (1, 7_000_000)
    assert got[3] == (1, 5_000_000)


def test_trigram_kn_hand_computed_backoff_chain(spark):
    """Pin the three backoff levels on a hand-computed micro-corpus:
    train 'a b c a b d' gives c3={abc:1,bca:1,cab:1,abd:1},
    ctx(a,b)=(2,2), nn=4 continuation types."""
    from lswms_forage_etl_spark.operators.lm import trigram_kn_surprisal
    docs = [(0, "a b c a b d", "en", "ref"),
            (1, "a b c", "en", "web"),    # seen trigram: bl(2)-bl(0)=2
            (2, "a b x", "en", "web"),    # alpha3=0, alpha2=0, oov x:
                                          # bl(4)+4 = 7
            (3, "x y z", "en", "web"),    # all unseen: 0+0+bl(4)+4 = 7
            (4, "p q r", "de", "web")]    # lang absent: 1+4 = 5
    df = spark.createDataFrame(docs, SCHEMA)
    got = {r["doc_id"]: (r["n_trigrams"], r["surprisal_ppm"])
           for r in trigram_kn_surprisal(df, TRAIN).collect()}
    release_tracked()
    assert got[1] == (1, 2_000_000)
    assert got[2] == (1, 7_000_000)
    assert got[3] == (1, 7_000_000)
    assert got[4] == (1, 5_000_000)
