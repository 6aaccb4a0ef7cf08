"""Sequence packing / token budgets / chunking: layout invariants that
must hold at any scale — contiguity of the packed stream, budget
prefix-closure, full chunk coverage — plus partitioning-invariance
(layout is a pure function of keys, never of physical placement)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
    token_budget_sample,
)

BUDGET = 64


def _u32(key, seed=0):
    """Python twin of operators.sampling.sample_u32."""
    return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16)


def _docs(spark, n=300):
    # token counts 1..40, deterministic
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 40 + 1).cast("long").alias("n_tok"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"))


def test_pack_stream_is_contiguous_per_shard(spark):
    out = pack_sequences(_docs(spark), "n_tok", BUDGET, "doc_id",
                         n_shards=4).collect()
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        # reconstruct stream order from (pack_id, pack_offset)
        rows.sort(key=lambda r: (r["pack_id"], r["pack_offset"]))
        pos = 0
        for r in rows:
            start = r["pack_id"] * BUDGET + r["pack_offset"]
            assert start == pos, "gap or overlap in packed stream"
            pos += r["n_tokens"]
            end = start + max(r["n_tokens"], 1) - 1
            assert r["packs_spanned"] == end // BUDGET - start // BUDGET + 1


def test_pack_layout_partitioning_invariant(spark):
    d = _docs(spark)
    a = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"])
         for r in pack_sequences(d, "n_tok", BUDGET, "doc_id").collect()}
    b = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"])
         for r in pack_sequences(d.repartition(17), "n_tok", BUDGET,
                                 "doc_id").collect()}
    assert a == b


def test_token_budget_prefix_property(spark):
    d = _docs(spark)
    out = token_budget_sample(
        d, "lang", "n_tok", budgets={"l0": 400, "l1": 200},
        key_col="doc_id", default_budget=80, n_shards=4).collect()
    assert out
    shard_budget = {"l0": 100, "l1": 50, "l2": 20}
    spent = defaultdict(int)
    for r in out:
        spent[(r["lang"], r["shard"])] += r["n_tokens"]
    for (lang, _), tot in spent.items():
        assert tot <= shard_budget[lang]
    # prefix-closed in hash order: if a doc is kept, every doc before it
    # in the same (lang, shard) stream is kept too — the sample is "take
    # docs until the budget fills", not an arbitrary subset
    kept = {r["doc_id"] for r in out}
    all_rows = d.collect()
    streams = defaultdict(list)
    for r in all_rows:
        streams[(r["lang"], _u32(r["doc_id"]) % 4)].append(r)
    for rows in streams.values():
        rows.sort(key=lambda r: (_u32(r["doc_id"]), r["doc_id"]))
        seen_dropped = False
        for r in rows:
            if r["doc_id"] in kept:
                assert not seen_dropped, "hole in the budget prefix"
            else:
                seen_dropped = True


def test_chunk_coverage_and_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))),
         (2, "a b c"),
         (3, ""),
         (4, "   ")],
        ["doc_id", "text"])
    out = chunk_documents(docs, "text", "doc_id", size=64, stride=48)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"]))
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    # empty/whitespace docs emit nothing
    assert 3 not in by_doc and 4 not in by_doc
    # doc 1: 150 tokens -> starts 0,48,96,144 ; sizes 64,64,54,6
    c1 = by_doc[1]
    assert [r["chunk_start"] for r in c1] == [0, 48, 96, 144]
    assert [r["n_chunk_tokens"] for r in c1] == [64, 64, 54, 6]
    # every token index covered by at least one chunk
    covered = set()
    for r in c1:
        covered |= set(range(r["chunk_start"],
                             r["chunk_start"] + r["n_chunk_tokens"]))
    assert covered == set(range(150))
    # doc 2: single short chunk, fingerprint = md5 of the join
    c2 = by_doc[2]
    assert len(c2) == 1 and c2[0]["n_chunk_tokens"] == 3
    assert c2[0]["chunk_fp"] == hashlib.md5(b"a b c").hexdigest()


def test_training_order_epochs_and_invariance(spark):
    """Epoch-seeded shuffle: per-shard positions are dense 0..n-1,
    different epochs give different permutations, and the layout is
    identical under any input partitioning (hash-derived, not
    partition-derived)."""
    from lswms_forage_etl_spark.operators.packing import training_order

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string")
    e0 = training_order(docs, "doc_id", n_shards=4, epoch=0).collect()
    e1 = training_order(docs, "doc_id", n_shards=4, epoch=1).collect()

    by_shard = {}
    for r in e0:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    assert len(e0) == 300 and 1 <= len(by_shard) <= 4

    o0 = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in e0}
    o1 = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in e1}
    assert o0 != o1                      # epochs permute independently

    rep = training_order(docs.repartition(13), "doc_id",
                         n_shards=4, epoch=0).collect()
    assert {r["doc_id"]: (r["shard"], r["pos_in_shard"])
            for r in rep} == o0          # partitioning-invariant


def test_write_training_shards_roundtrip(spark, tmp_path):
    import json
    import os

    from pyspark.sql import functions as SF

    from lswms_forage_etl_spark.functions.text import bpe_ish_token_count
    from lswms_forage_etl_spark.operators.packing import (
        pack_sequences, write_training_shards)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = docs.select("doc_id", bpe_ish_token_count("text").alias("n_tok"))
    packed = pack_sequences(d, "n_tok", budget=256, key_col="doc_id",
                            n_shards=4)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(packed, docs, path)
    m = {r["shard"]: r for r in manifest.collect()}
    assert set(m) == {0, 1, 2, 3}
    assert sum(r["n_docs"] for r in m.values()) == docs.count()
    # physical packs per shard == ceil(shard token total / budget)
    # (the concat-and-split invariant; countDistinct(pack_id) would
    # undercount packs a long doc spills through — review catch)
    for r in m.values():
        assert r["n_packs"] == -(-r["n_tokens"] // 256)
    # the json twin agrees with the DataFrame manifest
    with open(os.path.join(path, "_shard_manifest.json")) as fh:
        js = json.load(fh)
    assert {int(k): v["n_docs"] for k, v in js.items()} == \
        {k: r["n_docs"] for k, r in m.items()}
    # read-back: complete, and ON-DISK row order within every file is
    # (pack_id, pack_offset) — NO orderBy on the read (asserting after
    # an orderBy was a tautology; per-file order is what parquet
    # preserves and what a sequential dataloader consumes)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    rows = (back.where("shard = 0")
            .select(SF.input_file_name().alias("f"),
                    "pack_id", "pack_offset").collect())
    per_file: dict = {}
    for r in rows:
        per_file.setdefault(r["f"], []).append(
            (r["pack_id"], r["pack_offset"]))
    assert per_file
    for seq in per_file.values():
        assert seq == sorted(seq)
    assert "text" in back.columns          # payload travelled with layout


def test_shard_manifest_counts_spilled_packs(spark):
    from lswms_forage_etl_spark.operators.packing import (
        pack_sequences, shard_manifest)
    # one 600-token doc spans packs 0-2; a 50-token doc starts in pack 2
    # -> 3 physical packs, but only 2 distinct first-token pack ids
    d = spark.createDataFrame([(1, 600), (2, 50)],
                              "doc_id long, n_tok long")
    packed = pack_sequences(d, "n_tok", budget=256, key_col="doc_id",
                            n_shards=1)
    r = shard_manifest(packed).collect()[0]
    assert r["n_docs"] == 2
    assert r["n_tokens"] == 650
    assert r["n_packs"] == 3
