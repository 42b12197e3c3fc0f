"""Z-order layout (functions.zorder): interleave correctness against
a pure-Python reference, and the actual data-skipping effect measured
on real parquet row-group min/max statistics — the property the
operator exists for."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from iotdatapipeline_spark.functions.zorder import morton_code, zorder_by
from iotdatapipeline_spark.sources import load_table


def py_morton(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


class TestMortonCode:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(
            [(a, b) for a in (0, 1, 5, 255, 65535, 70000) for b in (0, 3, 128, 65535)],
            "a bigint, b bigint",
        )
        rows = df.select("a", "b", morton_code(F.col("a"), F.col("b")).alias("z")).collect()
        for r in rows:
            assert r.z == py_morton(r.a & 0xFFFF, r.b & 0xFFFF), (r.a, r.b)

    def test_locality(self, spark):
        # adjacent cells in (a,b) space differ in few low-order z bits:
        # the code of (a, b) and (a+1, b) share all bits above 2*ceil(log2 ...)
        assert py_morton(2, 3) == 0b1110
        assert py_morton(3, 3) == 0b1111


class TestDataSkipping:
    def test_zorder_prunes_on_second_column(self, spark, sf_oracle, tmp_path):
        """Write the same events twice — sorted by station only vs
        Z-ordered by (station, counter) — with identical row-group
        sizes, then measure against the parquet footers how many row
        groups a counter-range predicate could skip. The Z-ordered
        layout must bound ``counter`` per row group; the
        single-column layout cannot (counter is uniform within every
        station run)."""
        ev = load_table(spark, sf_oracle, "events").select(
            F.col("user_id").alias("station"),
            F.floor(F.col("value") * 100).cast("long").alias("counter"),
            "event_id",
        )

        plain = ev.orderBy("station", "event_id").toPandas()
        zord = zorder_by(ev, ("station", "counter")).toPandas()

        paths = {}
        for name, pdf in (("plain", plain), ("zorder", zord)):
            p = str(tmp_path / f"{name}.parquet")
            import pyarrow as pa

            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p, row_group_size=500)
            paths[name] = p

        def overlap_fraction(path: str, lo: int, hi: int) -> float:
            md = pq.ParquetFile(path).metadata
            idx = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
            ci = idx["counter"]
            n = md.num_row_groups
            hit = 0
            for g in range(n):
                st = md.row_group(g).column(ci).statistics
                if st.max >= lo and st.min <= hi:
                    hit += 1
            return hit / n

        # a 6%-selectivity counter band: Z-order must let most row
        # groups be skipped; station-sorted cannot skip any (counter
        # spans ~the full domain inside every row group)
        f_plain = overlap_fraction(paths["plain"], 40, 45)
        f_zorder = overlap_fraction(paths["zorder"], 40, 45)
        assert f_plain >= 0.9, f_plain
        assert f_zorder < 0.5, f_zorder
