"""Synthesize a larger scale factor by key-shifted replication of sf0.1.

Writes /tmp/sfsynth/sf1.0/*.parquet with REPLICAS copies of every
SF-growing table, shifting primary/foreign keys per replica so join
cardinalities scale linearly (orderkey/custkey/suppkey/partkey families
stay consistent); constant tables (region, nation) are copied as-is.

Usage: python tools/synth_scale.py [REPLICAS=10]

The point is the bench scaling curve (BASELINE.md round 3): per-query
wall-clock at 10× the rows shows which part of the local-mode time is
scheduler floor (constant) vs data-proportional work.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfsynth/sf1.0"  # argv[2] overrides (e.g. /tmp/sfsynth/sf10)

# table -> columns to shift by replica * (max+1) of the base column's family.
# Shifting the full id family keeps every join 1:1 with the base data.
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]

# column -> the base table/column that defines its family's shift stride
FAMILY = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    global DST
    if len(sys.argv) > 2:
        DST = sys.argv[2]
    os.makedirs(DST, exist_ok=True)

    strides: dict[tuple[str, str], int] = {}
    for fam in set(FAMILY.values()):
        t = pq.read_table(f"{SRC}/{fam[0]}.parquet", columns=[fam[1]])
        strides[fam] = pc.max(t.column(0)).as_py() + 1

    for name in COPY:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet")
        print(f"{name}: copied")

    for name, cols in SHIFT.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(replicas):
            t = base
            if i:
                for c in cols:
                    stride = strides[FAMILY[c]] * i
                    idx = t.schema.get_field_index(c)
                    shifted = pc.add(t.column(idx), stride).cast(t.schema.field(c).type)
                    t = t.set_column(idx, t.schema.field(c), shifted)
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
