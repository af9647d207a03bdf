"""Synthesize an sf1-equivalent probe dataset by 10x-replicating sf0.1
(VERDICT r6 item 6).

The driver ships sf{0.001,0.01,0.1} only; the superlinear SCALING rows
(x12/x13/x34/t18/x29) need 100x-of-sf0.01 evidence.  This generator
replicates sf0.1 tenfold with DISJOINT key spaces per replica —
horizontal growth, the way a real corpus grows:

* documents: doc_id offset; each replica's texts get a tiny unique
  suffix (' zz<k>w<doc_id mod 97>') so the 5-gram vocabulary grows with
  the corpus instead of collapsing onto 10 exact copies (which would
  overstate x29/x12 superlinearity via pathological duplicate pileup);
  n_chars recomputed to stay consistent.
* embeddings: vec_id offset; deterministic per-(replica, dim) milli
  jitter keeps the cluster structure while avoiding 10 exact copies of
  every vector (SemDeDup/SRP worst case).
* events: event_id/user_id offsets — 10x the users at the same per-user
  event density (x34's realistic scale axis).
* customer/orders/lineitem: consistent key offsets on both sides of
  every join edge (custkey, orderkey).
* region/nation/supplier/part: copied unchanged (dimension tables).

Everything is integer-arithmetic deterministic (no RNG) and written
with pyarrow preserving each source file's physical schema.  Output is
probe-only evidence for SCALING.md — never a correctness fixture.

Usage: python tools/make_scale_probe_data.py [out_dir]   (default /tmp/sfprobe1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
FACTOR = 10
COPY_TABLES = ["region", "nation", "supplier", "part"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows")


def _offset(col: pa.ChunkedArray, k: int, span: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(k * span, type=col.type))


def replicate_documents(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    span = pc.max(t.column("doc_id")).as_py() + 1
    parts = []
    for k in range(FACTOR):
        doc_id = _offset(t.column("doc_id"), k, span)
        if k == 0:
            text = t.column("text")
        else:
            doc_mod = pc.subtract(
                t.column("doc_id"),
                pc.multiply(
                    pc.floor(pc.divide(t.column("doc_id"), 97)), 97
                ),
            )
            suffix = pc.binary_join_element_wise(
                pa.chunked_array([pa.array([f" zz{k}w"] * t.num_rows)]),
                pc.cast(pc.cast(doc_mod, pa.int64()), pa.string()),
                "",
            )
            text = pc.binary_join_element_wise(t.column("text"), suffix, "")
        n_chars = pc.cast(pc.utf8_length(text), t.schema.field("n_chars").type)
        parts.append(
            pa.table(
                {
                    "doc_id": doc_id,
                    "text": text,
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "n_chars": n_chars,
                }
            )
        )
    _write(out_dir, "documents", pa.concat_tables(parts))


def replicate_embeddings(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    span = pc.max(t.column("vec_id")).as_py() + 1
    emb_type = t.schema.field("embedding").type
    dims = len(t.column("embedding")[0])
    parts = []
    for k in range(FACTOR):
        if k == 0:
            emb = t.column("embedding")
        else:
            # per-(replica, dim) additive jitter in [-0.005, 0.005]:
            # flatten, add, rebuild — vectorized, deterministic
            jit = pa.array(
                [((k * 7 + d * 3) % 11 - 5) / 1000.0 for d in range(dims)],
                type=pa.float32(),
            )
            chunks = []
            for chunk in t.column("embedding").chunks:
                flat = pc.list_flatten(chunk)
                assert len(flat) == len(chunk) * dims, "ragged embeddings"
                tiled = pa.chunked_array([jit] * len(chunk)).combine_chunks()
                moved = pc.add(flat, tiled)
                chunks.append(
                    pa.ListArray.from_arrays(chunk.offsets, moved).cast(
                        emb_type
                    )
                )
            emb = pa.chunked_array(chunks)
        parts.append(
            pa.table(
                {
                    "vec_id": _offset(t.column("vec_id"), k, span),
                    "embedding": emb,
                    "label": t.column("label"),
                }
            )
        )
    _write(out_dir, "embeddings", pa.concat_tables(parts))


def replicate_events(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    espan = pc.max(t.column("event_id")).as_py() + 1
    uspan = pc.max(t.column("user_id")).as_py() + 1
    parts = []
    for k in range(FACTOR):
        parts.append(
            pa.table(
                {
                    "event_id": _offset(t.column("event_id"), k, espan),
                    "ts": t.column("ts"),
                    "user_id": _offset(t.column("user_id"), k, uspan),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
        )
    _write(out_dir, "events", pa.concat_tables(parts))


def replicate_tpch(out_dir: str) -> None:
    cust = pq.read_table(os.path.join(SRC, "customer.parquet"))
    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    cspan = pc.max(cust.column("c_custkey")).as_py() + 1
    ospan = pc.max(orders.column("o_orderkey")).as_py() + 1

    def rep(t: pa.Table, offsets: dict[str, int]) -> pa.Table:
        parts = []
        for k in range(FACTOR):
            cols = {}
            for name in t.column_names:
                col = t.column(name)
                if name in offsets:
                    col = _offset(col, k, offsets[name])
                cols[name] = col
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    _write(out_dir, "customer", rep(cust, {"c_custkey": cspan}))
    _write(
        out_dir,
        "orders",
        rep(orders, {"o_orderkey": ospan, "o_custkey": cspan}),
    )
    _write(out_dir, "lineitem", rep(li, {"l_orderkey": ospan}))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1"
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY_TABLES:
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{name}.parquet")),
            os.path.join(out_dir, f"{name}.parquet"),
            compression="snappy",
        )
        print(f"{name}: copied")
    replicate_documents(out_dir)
    replicate_embeddings(out_dir)
    replicate_events(out_dir)
    replicate_tpch(out_dir)
    print(f"probe dataset at {out_dir}")


if __name__ == "__main__":
    main()
