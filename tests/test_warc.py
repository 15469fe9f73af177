"""WARC source + sink (sources/warc.py) — framing inversion, distributed
roundtrip, determinism, malformed-input behavior."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from pregel_rs_spark.sources.warc import (
    build_response_record,
    build_warcinfo_record,
    parse_warc_bytes,
    read_warc,
    record_id_for,
    write_warc_files,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_parser_inverts_builder():
    html = "<html><body>café ☃</body></html>".encode("utf-8")
    blob = (
        build_warcinfo_record("f.warc", "2024-01-01T00:00:00Z")
        + build_response_record(
            "https://x.example/a?q=1", "2024-02-03T04:05:06Z", html, 404
        )
    )
    recs = parse_warc_bytes(blob)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    info, resp = recs
    assert info["http_status"] is None
    assert resp["target_uri"] == "https://x.example/a?q=1"
    assert resp["warc_date"] == "2024-02-03T04:05:06Z"
    assert resp["http_status"] == 404
    assert resp["payload"] == html  # byte-identity through HTTP framing
    assert resp["record_id"] == record_id_for("https://x.example/a?q=1")


def test_parser_strict_vs_salvage():
    blob = build_response_record(
        "https://x.example/a", "2024-01-01T00:00:00Z", b"<html>x</html>"
    )
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(blob[:-20])
    with pytest.raises(ValueError, match="malformed"):
        parse_warc_bytes(b"GARBAGE" + blob)
    # salvage: keep complete leading records, stop at the damage
    assert len(parse_warc_bytes(blob + blob[:30], strict=False)) == 1
    assert parse_warc_bytes(b"", strict=False) == []


def test_distributed_roundtrip_and_determinism(spark, tmp_path):
    from pregel_rs_spark.sources.synth import gen_page, synth_pages

    n = 200
    pages = synth_pages(spark, n, seed=42, partitions=4)
    out = str(tmp_path / "warc")
    man = write_warc_files(
        pages.select("url", "warc_ts", "html"), out, pages_per_file=50
    ).collect()
    assert sum(r.n_records for r in man) == n + len(man)  # + warcinfo each
    assert {os.path.basename(r.path) for r in man} == {
        f"part-{r.gid:05d}.warc" for r in man
    }

    back = read_warc(spark, out + "/*.warc")
    resp = back.filter(F.col("warc_type") == "response")
    got = {
        r.target_uri: (r.http_status, bytes(r.payload))
        for r in resp.collect()
    }
    assert len(got) == n
    for i in range(0, n, 17):
        p = gen_page(i, n, 42)
        assert got[p["url"]] == (200, p["html"]), p["url"]
    # every warcinfo record carries its own filename, no status
    infos = back.filter(F.col("warc_type") == "warcinfo")
    assert infos.count() == len(man)
    assert infos.filter(F.col("http_status").isNotNull()).count() == 0

    # rewrite → byte-identical files (deterministic sink)
    sig1 = {
        f: hashlib.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out))
    }
    out2 = str(tmp_path / "warc2")
    write_warc_files(
        pages.select("url", "warc_ts", "html"), out2, pages_per_file=50
    ).collect()
    sig2 = {
        f: hashlib.sha256(
            open(os.path.join(out2, f), "rb").read()
        ).hexdigest()
        for f in sorted(os.listdir(out2))
    }
    assert sig1 == sig2


def test_committed_warc_oracle_matches_regeneration():
    import pandas as pd

    from tools.gen_warc_oracle import expected_records

    committed = pd.read_parquet(
        os.path.join(DATA, "warc_records_n1000_seed42.parquet")
    )
    regen = pd.DataFrame(expected_records(1000, 42))
    pd.testing.assert_frame_equal(
        committed.sort_values("target_uri").reset_index(drop=True),
        regen.sort_values("target_uri").reset_index(drop=True),
    )
