"""TableStore dispatch tests — the Iceberg-vs-parquet seam (sources/io.py).

The sandbox has no Iceberg runtime jar (the first test pins that
environmental fact so the excuse in sources/io.py stays verified).  The
remaining tests cover everything that CAN be exercised here:

* the dispatch rule (catalog requested + jar absent -> parquet fallback,
  same call sites) — this is the load-bearing claim that lets every test
  and example share one code path with a real-cluster Iceberg deployment;
* the fallback's atomic-overwrite semantics (write-tmp-then-rename);
* the Iceberg branch itself, driven to Spark's V2 catalog-resolution
  boundary: with availability forced on, ``write``/``read`` must hand the
  exact ``<catalog>.<name>`` identifier to Spark (asserted from the
  AnalysisException for an unconfigured catalog) — so the branch is
  identifier-plumbing-tested even though only a real Iceberg catalog can
  take it further.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from pregel_rs_spark.sources import io as io_mod


def test_iceberg_jar_absent_is_pinned(spark):
    # sources/io.py's module docstring claims the sandbox has no Iceberg
    # runtime; if a jar ever appears this fails and the excuse must go.
    assert io_mod._iceberg_available(spark) is False


def test_catalog_request_without_jar_falls_back(spark, tmp_path):
    st = io_mod.TableStore(spark, str(tmp_path), catalog="ice")
    assert st.use_iceberg is False
    df = spark.range(6).withColumn("p", F.pmod("id", F.lit(2)))
    st.write("t1", df, partition_by=["p"])
    assert st.exists("t1")
    assert st.read("t1").count() == 6
    # partition_by is a real layout in the fallback too
    assert any(
        d.name.startswith("p=") for d in (tmp_path / "t1").iterdir()
    )


def test_fallback_overwrite_is_atomic_rename(spark, tmp_path):
    st = io_mod.TableStore(spark, str(tmp_path))
    st.write("t2", spark.range(4))
    st.write("t2", spark.range(9))  # second write replaces via rename
    assert st.read("t2").count() == 9
    # no temp dirs left behind
    leftovers = [d.name for d in tmp_path.iterdir() if d.name.startswith(".t2.tmp")]
    assert leftovers == []


def test_iceberg_branch_passes_identifier_to_v2_catalog(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(io_mod, "_iceberg_available", lambda s: True)
    st = io_mod.TableStore(spark, str(tmp_path), catalog="ice_missing")
    assert st.use_iceberg is True
    df = spark.range(3)
    with pytest.raises(AnalysisException) as ei:
        st.write("t3", df)
    assert "ice_missing" in str(ei.value)
    with pytest.raises(AnalysisException) as ei:
        st.read("t3")
    assert "ice_missing" in str(ei.value)
