"""Generate a larger scale slice by key-shifted replication of sf0.1.

The driver's testdata generator is not shipped, so scaling measurements
(round-2 VERDICT #5) build sfX = K copies of sf0.1 with every entity key
offset by copy-index * stride. This preserves the per-copy value
distributions EXACTLY (each copy is bit-identical modulo keys) while
multiplying cardinalities and join fan-in K-fold — which is the quantity
the scaling curves measure. Referential integrity is preserved:
customer/orders share the custkey shift, orders/lineitem the orderkey
shift, supplier/lineitem the suppkey shift, part/lineitem the partkey
shift. region/nation are fixed dimension domains and are NOT replicated
(their keys are semantic, 25 nations / 5 regions at every TPC-H scale).
Text bodies are replicated unchanged, so dedup families see K-member
duplicate clusters — bounded K² pair work per cluster, the realistic
shape of a corpus crawled K times.

Usage: python tools/make_scale_slice.py K OUT_DIR   (e.g. 5 /tmp/scale/sf0.5)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# per-table: {column: stride} — key columns offset by copy * stride;
# strides are far above each table's max key so copies never collide
STRIDES = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
FIXED = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    for name in FIXED:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{out}/{name}.parquet"
        )
        print(f"{name}: copied")
    for name, strides in STRIDES.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        copies = []
        for c in range(k):
            t = base
            for col, stride in strides.items():
                idx = t.column_names.index(col)
                shifted = pc.add(t.column(col), pa.scalar(c * stride, pa.int64()))
                t = t.set_column(idx, t.field(idx), shifted)
            copies.append(t)
        merged = pa.concat_tables(copies)
        pq.write_table(merged, f"{out}/{name}.parquet")
        print(f"{name}: {base.num_rows} x {k} = {merged.num_rows}")


if __name__ == "__main__":
    main()
