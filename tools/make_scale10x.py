"""Build a 10x scaling slice for the empirical-scaling measurement
(VERDICT r4 item 8) at /root/scale10x/ (NOT under the read-only
/root/testdata).

Construction is BLOCK-DIAGONAL so true operator output grows linearly
and wall-clock scaling is interpretable:

  documents   block k (k=0..9): doc_id += k*10_000_000; every token of
              `text` is prefixed "r{k}x" for k>0. Within a block the
              shingle/duplication structure is EXACTLY the sf0.1
              structure (same tokens sharing, just renamed); across
              blocks no shingle ever collides -> near-dup pairs,
              clusters, and contamination hits scale exactly 10x.
  embeddings  block k: vec_id += k*10_000_000; the 64 dims are permuted
              by a block-seeded permutation and sign-flipped by a
              block-seeded pattern. Orthogonal transform => within-block
              inner products (and hyperplane-LSH geometry) are exactly
              preserved; cross-block cosines are ~random noise.
  events      block k: event_id/user_id += k*10_000_000; ts/type/value
              verbatim, so every per-user event SEQUENCE (funnel order,
              attribution windows, SCD2 change history, TWAP intervals)
              is exactly the sf0.1 sequence under a renamed user —
              user-keyed outputs scale exactly 10x while time-grid
              outputs (resample days, anomaly pivots) keep their group
              count and grow 10x per group, matching a real traffic
              scale-up (round 10: the events family joined the ladder).

Every other table is copied verbatim so any queries() entry can run
against the directory.

Usage: python tools/make_scale10x.py [out_dir] [src_dir] [blocks] [stride] [tag]

Chaining builds larger slices: a 100x slice is 10 blocks over the 10x
slice with a wider id stride and a distinct prefix tag (prefixes compose,
so cross-slice shingles still never collide):

  python tools/make_scale10x.py /root/scale100x /root/scale10x 10 \
      1000000000 s
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BLOCK_STRIDE = 10_000_000


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/scale10x")
    src = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    stride = int(sys.argv[4]) if len(sys.argv) > 4 else BLOCK_STRIDE
    tag = sys.argv[5] if len(sys.argv) > 5 else "r"
    out.mkdir(parents=True, exist_ok=True)

    docs = pq.read_table(src / "documents.parquet")
    blocks = []
    for k in range(n_blocks):
        ids = pc.add(docs["doc_id"], k * stride)
        if k == 0:
            text = docs["text"]
        else:
            text = pc.replace_substring_regex(
                docs["text"], r"(\S+)", rf"{tag}{k}x\1")
        blocks.append(pa.table({
            "doc_id": ids, "text": text, "lang": docs["lang"],
            "source": docs["source"], "n_chars": docs["n_chars"]}))
    # row_group_size: a single-row-group file is UNSPLITTABLE no matter
    # what maxPartitionBytes says — scans of the big slices would run
    # single-task (measured: text_repeated_ngrams pinned one core at
    # 100x). Real corpora are many files/row groups; 20k-row groups make
    # the slice behave like one.
    pq.write_table(pa.concat_tables(blocks), out / "documents.parquet",
                   row_group_size=20_000)
    print(f"documents: {docs.num_rows} -> {docs.num_rows * n_blocks}")

    emb = pq.read_table(src / "embeddings.parquet")
    vecs = np.asarray(emb["embedding"].combine_chunks().flatten(),
                      dtype=np.float32).reshape(emb.num_rows, -1)
    dim = vecs.shape[1]
    eblocks = []
    for k in range(n_blocks):
        import zlib
        rng = np.random.default_rng(zlib.crc32(f"{tag}{k}".encode()))
        if k == 0:
            tv = vecs
        else:
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            tv = vecs[:, perm] * signs
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(tv.reshape(-1), type=pa.float32()), dim).cast(
            pa.list_(pa.float32()))
        eblocks.append(pa.table({
            "vec_id": pc.add(emb["vec_id"], k * stride),
            "embedding": arr, "label": emb["label"]}))
    pq.write_table(pa.concat_tables(eblocks), out / "embeddings.parquet",
                   row_group_size=20_000)
    print(f"embeddings: {emb.num_rows} -> {emb.num_rows * n_blocks}")

    ev = pq.read_table(src / "events.parquet")
    vblocks = []
    for k in range(n_blocks):
        vblocks.append(pa.table({
            "event_id": pc.add(ev["event_id"], k * stride),
            "ts": ev["ts"],
            "user_id": pc.add(ev["user_id"], k * stride),
            "event_type": ev["event_type"],
            "value": ev["value"],
            "props": ev["props"]}))
    pq.write_table(pa.concat_tables(vblocks), out / "events.parquet",
                   row_group_size=100_000)
    print(f"events: {ev.num_rows} -> {ev.num_rows * n_blocks}")

    for p in src.glob("*.parquet"):
        if p.name not in ("documents.parquet", "embeddings.parquet",
                          "events.parquet"):
            shutil.copy(p, out / p.name)
    print(f"other tables copied verbatim from {src}")


if __name__ == "__main__":
    main()
