#!/usr/bin/env python3
"""Scale the driver testdata up K x for scale-trend benchmarking (dev/driver
tooling only — the Spark library has no Python deps). Replicates
events/documents/embeddings with DETERMINISTIC per-replica mutations chosen
so the workload SHAPE stays that of the source scale:

- events: event_id shifts by a multiple of 10 per replica, preserving the
  span-tree structure Tables.spansFrom derives (trace = event_id/10,
  parent = event_id-1); labels cardinality stays constant (user_id kept).
- documents: doc_id shifts; every 4th word is replaced with a
  replica-dependent token, so replicas are NOT near-duplicates of their
  source (3-shingle Jaccard vs source ~= 0.42, below the dedup
  thresholds) and the candidate-pair rate scales ~linearly with rows.
- embeddings: vec_id shifts; a small deterministic per-replica offset
  decorrelates replicas so ANN candidate sets scale linearly too.

Usage: python3 tools/genscale.py /root/testdata/sf0.1 target/sf1 10
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)

    ev = pq.read_table(os.path.join(src, "events.parquet"))
    max_id = pc.max(ev["event_id"]).as_py()
    shift = ((max_id // 10) + 1) * 10  # multiple of 10: keeps trace trees
    parts = []
    for r in range(k):
        t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                          pc.add(ev["event_id"], r * shift))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "events.parquet"))
    print(f"events: {ev.num_rows} -> {ev.num_rows * k}")

    doc = pq.read_table(os.path.join(src, "documents.parquet"))
    dmax = pc.max(doc["doc_id"]).as_py() + 1
    texts = doc["text"].to_pylist()
    parts = []
    for r in range(k):
        if r == 0:
            mutated = texts
        else:
            mutated = []
            for i, t in enumerate(texts):
                ws = t.split(" ")
                for j in range(0, len(ws), 4):
                    ws[j] = f"w{r}x{(i * 31 + j) % 997}"
                mutated.append(" ".join(ws))
        t = doc.set_column(doc.schema.get_field_index("doc_id"), "doc_id",
                           pc.add(doc["doc_id"], r * dmax))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(mutated, type=doc.schema.field("text").type))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pc.cast(pc.utf8_length(t["text"]),
                                 doc.schema.field("n_chars").type))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(dst, "documents.parquet"))
    print(f"documents: {doc.num_rows} -> {doc.num_rows * k}")

    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vmax = pc.max(emb["vec_id"]).as_py() + 1
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    parts = []
    rng_base = np.arange(dim, dtype=np.float32)
    for r in range(k):
        if r == 0:
            out = vecs
        else:
            out = vecs + 0.15 * np.sin(rng_base * (r + 1) * 0.7)[None, :]
        t = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                           pc.add(emb["vec_id"], r * vmax))
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array([row.tolist() for row in out],
                     type=emb.schema.field("embedding").type))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(dst, "embeddings.parquet"))
    print(f"embeddings: {emb.num_rows} -> {emb.num_rows * k}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
