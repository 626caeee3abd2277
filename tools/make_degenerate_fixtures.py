"""Build the degenerate fixture sets the r8 audit swept (SCALE.md):

    python tools/make_degenerate_fixtures.py [--src /root/testdata/sf0.001] \
        [--out-base /tmp]

Writes four sibling fixture directories, each with all ten tables in the
production schemas:

- ``sf_empty``       every table zero rows (schema intact) — the
                     "filter matched nothing" state;
- ``sf_factsempty``  dims present, the five fact tables empty — the
                     "today's partition hasn't landed" state;
- ``sf_onerow``      every table exactly its first row — the
                     zero-variance / one-sided-split state;
- ``sf_nulls``       every 10th events.value / documents.text /
                     embeddings.embedding NULL — the "failed upstream
                     parse" state.

Then sweep each with the driver simulator:

    python tools/driver_sim.py --sf-dir /tmp/sf_nulls

Expected: 326/326 MATCH on sf_onerow and sf_nulls; 325/326 on the two
empty axes (the one failure is ``medallion_gold_profit_mart``'s
deliberate reference-parity empty-input guard — SURVEY.md §2A op #14).
The conventions each axis pins are tabulated in SCALE.md's round-8
sections and asserted entry-by-entry in tests/test_empty_inputs.py.
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FACTS = {"orders", "lineitem", "events", "documents", "embeddings"}
NULLIFY = {
    "events": ["value"],
    "documents": ["text"],
    "embeddings": ["embedding"],
}


def _null_holes(tab: pa.Table, cols: list[str]) -> pa.Table:
    for col in cols:
        idx = tab.schema.get_field_index(col)
        mask = pa.array([i % 10 == 0 for i in range(tab.num_rows)])
        tab = tab.set_column(
            idx,
            tab.schema.field(col),
            pc.if_else(
                mask,
                pa.nulls(tab.num_rows, tab.schema.field(col).type),
                tab.column(col).combine_chunks(),
            ),
        )
    return tab


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out-base", default="/tmp")
    args = ap.parse_args()

    dirs = {
        name: os.path.join(args.out_base, name)
        for name in ("sf_empty", "sf_factsempty", "sf_onerow", "sf_nulls")
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    for t in TABLES:
        tab = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        empty = tab.schema.empty_table()
        pq.write_table(empty, os.path.join(dirs["sf_empty"], f"{t}.parquet"))
        pq.write_table(
            empty if t in FACTS else tab,
            os.path.join(dirs["sf_factsempty"], f"{t}.parquet"),
        )
        pq.write_table(tab.slice(0, 1), os.path.join(dirs["sf_onerow"], f"{t}.parquet"))
        pq.write_table(
            _null_holes(tab, NULLIFY.get(t, [])),
            os.path.join(dirs["sf_nulls"], f"{t}.parquet"),
        )
        print(f"{t}: empty/factsempty/onerow/nulls written")
    print("fixture sets:", ", ".join(dirs.values()))


if __name__ == "__main__":
    main()
