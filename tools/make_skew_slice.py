"""Build an ADVERSARIAL-SKEW slice (VERDICT r5 item 4) — the failure
geometry the block-diagonal scale ladder deliberately avoids, and the
one that kills real 100 TB runs:

  mega exact-dup cluster   `pct`% of documents get the IDENTICAL
                           boilerplate text (one ~120-token paragraph).
                           Doc-level LSH banding is quadratic in this
                           cluster; distinct-signature banding must stay
                           flat (the round-6 lsh_candidate_pairs claim
                           tools/skew_measure.py validates).
  hot token                every document (100%) gains one shared token,
                           stressing corpus_vocab's first aggregation
                           phase and any token-keyed shuffle.
  giant group              95% of documents are re-labeled lang='en' —
                           the one-giant-zone shape for the salted /
                           two-phase aggregation path.

Everything else is copied verbatim from the source sf dir so any
queries() entry can run against the slice.

Usage: python tools/make_skew_slice.py [out_dir] [src_dir] [dup_pct]
  default: /root/skewslice10 /root/testdata/sf0.1 10
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

HOT_TOKEN = "zq0hot"
BOILER = " ".join(
    f"boiler{i % 37}w{(i * 7) % 11}" for i in range(120))


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/skewslice10")
    src = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out.mkdir(parents=True, exist_ok=True)

    docs = pq.read_table(src / "documents.parquet")
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    n_dup = 0
    for i, did in enumerate(doc_ids):
        if did % 100 < pct:
            texts[i] = BOILER          # mega exact-dup cluster
            n_dup += 1
        else:
            texts[i] = f"{HOT_TOKEN} {texts[i]}"   # hot token (100%)
        if did % 100 < 95:
            langs[i] = "en"            # giant group
    tbl = pa.table({
        "doc_id": docs["doc_id"],
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": docs["source"],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    # multi-row-group: single-row-group parquet is unsplittable
    pq.write_table(tbl, out / "documents.parquet", row_group_size=1000)
    print(f"documents: {docs.num_rows} rows, {n_dup} exact clones "
          f"({100.0 * n_dup / docs.num_rows:.1f}%), hot token in all, "
          f"95% lang=en")

    # embeddings get the same mega exact-dup treatment: `pct`% of
    # vectors are replaced by ONE clone vector (vec_id % 100 < pct) —
    # identical signatures in every LSH band, the geometry that made
    # doc-level banding quadratic and the salted cap lossy
    emb = pq.read_table(src / "embeddings.parquet")
    ids = emb["vec_id"].to_pylist()
    vecs = emb["embedding"].to_pylist()
    # the clone value comes from a row INSIDE the pct set, so the clone
    # group is exactly {vid % 100 < pct} and C(n_vc, 2) accounting holds
    # (taking row 0 unconditionally added a silent extra member when
    # row 0 fell outside the set — round-6 review catch)
    members = [i for i, vid in enumerate(ids) if vid % 100 < pct]
    clone = vecs[members[0]] if members else None
    n_vc = 0
    for i in members:
        vecs[i] = clone
        n_vc += 1
    import pyarrow as _pa
    pq.write_table(_pa.table({
        "vec_id": emb["vec_id"],
        "embedding": _pa.array(vecs, type=emb.schema.field("embedding").type),
        "label": emb["label"]}), out / "embeddings.parquet",
        row_group_size=1000)
    print(f"embeddings: {emb.num_rows} rows, {n_vc} exact clones")

    for p in src.glob("*.parquet"):
        if p.name not in ("documents.parquet", "embeddings.parquet"):
            shutil.copy(p, out / p.name)
    print(f"other tables copied verbatim from {src}")


if __name__ == "__main__":
    main()
