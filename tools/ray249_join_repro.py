"""Minimal repro of the Ray Data 2.49 chained-hash-join defect that
stages/joins.sever_refs works around.

A hash join emits EMPTY partition blocks (schema looks right, but feeding
them into a second join's acero kernel raises "No match or multiple matches
for key field reference FieldRef.Name(...)"), and the poison survives
``materialize()`` and schema-normalizing ``map_batches``.  Dropping the
zero-row blocks and rebuilding via ``from_arrow_refs`` fixes it — no
filesystem staging, no driver collect.

Run: python tools/ray249_join_repro.py
"""

import pyarrow as pa
import ray
import ray.data as rd


def mk_side():
    return rd.from_arrow(pa.table({"id": ["a", "b", "c"], "sig": [b"1", b"2", b"3"]}))


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    base = rd.from_arrow(pa.table({"src": ["a", "b"], "dst": ["b", "c"]}))
    j1 = base.join(mk_side(), join_type="inner", num_partitions=4, on=("src",),
                   right_on=("id",), validate_schemas=False).materialize()

    try:
        j2 = j1.join(mk_side(), join_type="inner", num_partitions=4, on=("dst",),
                     right_on=("id",), validate_schemas=False, right_suffix="_b")
        print("chained join unexpectedly OK:", len(j2.take_all()))
    except Exception as e:
        print("chained join FAILED (the 2.49 bug):", str(e).splitlines()[-1][:120])

    refs = [r for r in j1.to_arrow_refs() if ray.get(r).num_rows > 0]
    fixed = rd.from_arrow_refs(refs)
    j2 = fixed.join(mk_side(), join_type="inner", num_partitions=4, on=("dst",),
                    right_on=("id",), validate_schemas=False, right_suffix="_b")
    print("severed join OK:", sorted(j2.take_all(), key=lambda r: r["src"]))
    ray.shutdown()


if __name__ == "__main__":
    main()
