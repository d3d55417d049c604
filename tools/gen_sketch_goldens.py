#!/usr/bin/env python3
"""Writes the committed sketch goldens (q15 HLL, q69 CMS) from the engine's
own output: runs `sbt Test/runMain graft.tools.GenSketchGoldens`, parses the
GOLDEN lines, and writes one single-file parquet per query under goldens/.

Engine-seeded by design (see GenSketchGoldens.scala): both sketches are
merge-order-independent, so the value is a pure function of corpus + seed —
a committed regression pin that upgrades the two rows-only queries to
value-exact certification. Rows carry corpus_tag/corpus_n checksums so one
file serves every scale factor.

Usage: python3 tools/gen_sketch_goldens.py
"""
import json
import pathlib
import subprocess

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent

SCHEMAS = {
    "q15_approx_distinct": pa.schema(
        [("corpus_tag", pa.int64()), ("corpus_n", pa.int64()),
         ("u_approx", pa.int64())]),
    "q69_sketch_cms": pa.schema(
        [("corpus_tag", pa.int64()), ("corpus_n", pa.int64()),
         ("l_suppkey", pa.int64()), ("est", pa.int64())]),
}


def main():
    out = subprocess.run(
        ["sbt", "-batch", "Test/runMain graft.tools.GenSketchGoldens"],
        cwd=REPO, capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        # sbt prefixes program stdout with "[info] "
        idx = line.find("GOLDEN ")
        if idx < 0:
            continue
        _, name, payload = line[idx:].split(" ", 2)
        rows = json.loads(payload)
        schema = SCHEMAS[name]
        table = pa.Table.from_pylist(rows, schema=schema)
        dest = REPO / "goldens" / f"{name}.parquet"
        pq.write_table(table, dest)
        print(f"wrote {dest}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
