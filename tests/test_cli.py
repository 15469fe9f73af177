"""python -m pregel_rs_spark CLI: end-to-end on a micro graph."""

import os

from pregel_rs_spark.__main__ import main


def test_cli_pagerank_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "edges")
    opath = os.path.join(tmp_path, "ranks")
    edges.write.parquet(epath)
    rc = main([
        "pagerank", "--edges", epath, "--out", opath,
        "--max-iter", "5", "--cores", "4",
    ])
    assert rc == 0
    out = spark.read.parquet(opath)
    assert out.count() == 4
    assert {"vertex_id", "rank"} <= set(out.columns)


def test_cli_histogram_and_reciprocity(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "e2")
    edges.write.parquet(epath)
    for algo, ncols in (("histogram", 4), ("reciprocity", 3)):
        opath = os.path.join(tmp_path, f"out_{algo}")
        assert main([algo, "--edges", epath, "--out", opath,
                     "--cores", "4"]) == 0
        df = spark.read.parquet(opath)
        assert len(df.columns) == ncols and df.count() >= 1


def test_cli_resume_fresh_process(spark, tmp_path):
    """North-rule resumability at the spark-submit-shaped CLI boundary:
    run interrupted at superstep 3 (via --max-iter), then resume IN A
    FRESH PROCESS with --resume to the full superstep count — final ranks
    must equal an uninterrupted run's."""
    import subprocess
    import sys

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (2, 5)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "edges_r")
    edges.write.parquet(epath)
    full_out = os.path.join(tmp_path, "ranks_full")
    res_out = os.path.join(tmp_path, "ranks_resumed")
    ck = os.path.join(tmp_path, "ck")

    common = ["pagerank", "--edges", epath, "--tol", "1e-30",
              "--cores", "4"]
    # uninterrupted reference run, 6 supersteps
    assert main(common + ["--out", full_out, "--max-iter", "6"]) == 0
    # interrupted run: 3 supersteps, checkpoint every superstep
    assert main(common + ["--out", os.path.join(tmp_path, "partial"),
                          "--max-iter", "3", "--checkpoint-root", ck,
                          "--checkpoint-every", "1"]) == 0
    # resume in a FRESH interpreter/JVM (the driver-restart scenario)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pregel_rs_spark"] + common
        + ["--out", res_out, "--max-iter", "6",
           "--checkpoint-root", ck, "--checkpoint-every", "1", "--resume"],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    full = {x.vertex_id: x.rank for x in spark.read.parquet(full_out).collect()}
    res = {x.vertex_id: x.rank for x in spark.read.parquet(res_out).collect()}
    assert full.keys() == res.keys()
    assert all(abs(full[k] - res[k]) <= 1e-12 for k in full)


def test_cli_cocitation_coupling_assortativity(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e3")
    edges.write.parquet(epath)
    for algo, ncols in (
        ("cocitation", 3), ("coupling", 3), ("assortativity", 2),
    ):
        opath = os.path.join(tmp_path, f"out_{algo}")
        assert main([algo, "--edges", epath, "--out", opath,
                     "--min-shared", "1", "--cores", "4"]) == 0
        df = spark.read.parquet(opath)
        assert len(df.columns) == ncols and df.count() >= 1


def test_cli_pagerank_warm_start(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e_warm")
    r1 = os.path.join(tmp_path, "ranks1")
    r2 = os.path.join(tmp_path, "ranks2")
    edges.write.parquet(epath)
    assert main(["pagerank", "--edges", epath, "--out", r1,
                 "--tol", "1e-9", "--max-iter", "100", "--cores", "4"]) == 0
    assert main(["pagerank", "--edges", epath, "--out", r2,
                 "--tol", "1e-9", "--max-iter", "100", "--cores", "4",
                 "--init-ranks", r1]) == 0
    a = {r.vertex_id: r.rank for r in spark.read.parquet(r1).collect()}
    b = {r.vertex_id: r.rank for r in spark.read.parquet(r2).collect()}
    assert all(abs(a[v] - b[v]) <= 1e-8 for v in a)


def test_cli_sssp_weighted(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2, 10.0), (1, 3, 1.0), (3, 2, 1.0)],
        "subject long, object long, w double",
    )
    epath = os.path.join(tmp_path, "e_w")
    opath = os.path.join(tmp_path, "d_w")
    edges.write.parquet(epath)
    assert main(["sssp", "--edges", epath, "--out", opath, "--source", "1",
                 "--weight-col", "w", "--cores", "4"]) == 0
    d = {r.vertex_id: r.distance for r in spark.read.parquet(opath).collect()}
    assert d[2] == 2.0 and d[3] == 1.0   # cheaper 2-hop route wins


def test_cli_ktruss(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "e_kt")
    opath = os.path.join(tmp_path, "o_kt")
    edges.write.parquet(epath)
    assert main(["ktruss", "--edges", epath, "--out", opath,
                 "--k", "3", "--cores", "4"]) == 0
    rows = {(r.a, r.b) for r in spark.read.parquet(opath).collect()}
    assert rows == {(1, 2), (1, 3), (2, 3)}


def test_cli_round3_graph_summaries(spark, tmp_path):
    """linkpred/katz/squares/transitivity/modularity/effdiam subcommands
    round-trip through parquet with the expected schemas."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e3")
    edges.write.parquet(epath)
    expect = {
        "linkpred": {"page_a", "page_b", "common_neighbors", "adamic_adar"},
        "katz": {"vertex_id", "katz"},
        "squares": {"wedge_pairs", "squares"},
        "transitivity": {"triangles", "wedges", "transitivity"},
        "modularity": {"n_edges_und", "n_communities", "modularity"},
        "effdiam": {"hop_reached", "nf_final_scaled", "effective_diameter"},
    }
    for algo, cols in expect.items():
        opath = os.path.join(tmp_path, f"out3_{algo}")
        assert main([
            algo, "--edges", epath, "--out", opath, "--cores", "4",
            "--k", "2", "--max-iter", "1",
        ]) == 0
        out = spark.read.parquet(opath)
        assert set(out.columns) == cols, algo
        assert out.count() >= 1


def test_cli_trust_and_negatives(spark, tmp_path):
    """trustrank/spammass (parquet seed list) and negsample round-trip."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e4")
    edges.write.parquet(epath)
    spath = os.path.join(tmp_path, "seeds")
    spark.createDataFrame([(1,), (3,)], "vertex_id long").write.parquet(spath)

    # missing --seeds is a usage error, not a crash
    assert main(["trustrank", "--edges", epath,
                 "--out", os.path.join(tmp_path, "x")]) == 2

    expect = {
        "trustrank": {"vertex_id", "out_degree", "teleport", "rank"},
        "spammass": {"vertex_id", "rank", "trust_rank", "spam_mass"},
    }
    for algo, cols in expect.items():
        opath = os.path.join(tmp_path, f"out4_{algo}")
        assert main([
            algo, "--edges", epath, "--out", opath, "--cores", "4",
            "--seeds", spath, "--max-iter", "3",
        ]) == 0
        out = spark.read.parquet(opath)
        assert set(out.columns) == cols, algo
        assert out.count() == 5

    opath = os.path.join(tmp_path, "out4_neg")
    assert main([
        "negsample", "--edges", epath, "--out", opath, "--cores", "4",
        "--n-per-vertex", "2", "--seed", "7",
    ]) == 0
    out = spark.read.parquet(opath)
    assert set(out.columns) == {"subject", "object", "sample_id"}
    pos = {(s, o) for s, o in [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1)]}
    rows = out.collect()
    assert rows and all(
        (r.subject, r.object) not in pos and r.subject != r.object
        for r in rows
    )


def test_cli_neighsample(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e5")
    edges.write.parquet(epath)
    opath = os.path.join(tmp_path, "out5")
    assert main([
        "neighsample", "--edges", epath, "--out", opath, "--cores", "4",
        "--fanouts", "1,1", "--seed", "3",
    ]) == 0
    out = spark.read.parquet(opath)
    assert set(out.columns) == {"root", "hop", "subject", "object"}
    assert set(r.hop for r in out.collect()) == {1, 2}


def test_cli_redirects(spark, tmp_path):
    """Redirect canonicalization at the CLI boundary: chain + loop."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (8, 7)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "e6")
    edges.write.parquet(epath)
    opath = os.path.join(tmp_path, "out6")
    assert main([
        "redirects", "--edges", epath, "--out", opath, "--cores", "4",
    ]) == 0
    got = {
        r.subject: (r.final, r.hops, r.resolved)
        for r in spark.read.parquet(opath).collect()
    }
    assert got[1] == (3, 2, True) and got[2] == (3, 1, True)
    assert got[7][2] is False and got[8][2] is False


def test_cli_coreness(spark, tmp_path):
    """coreness subcommand: exact core numbers on a known graph (K4 plus
    a pendant) round-trip through parquet."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e_cn")
    opath = os.path.join(tmp_path, "o_cn")
    edges.write.parquet(epath)
    assert main(["coreness", "--edges", epath, "--out", opath,
                 "--cores", "4"]) == 0
    got = {r.vertex_id: r.coreness
           for r in spark.read.parquet(opath).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1}


def test_cli_matching_topolayers_landmarks(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e_mtl")
    edges.write.parquet(epath)

    o1 = os.path.join(tmp_path, "out_matching")
    assert main(["matching", "--edges", epath, "--out", o1,
                 "--cores", "4"]) == 0
    m = spark.read.parquet(o1).collect()
    used = [v for r in m for v in (r.vertex_a, r.vertex_b)]
    assert len(used) == len(set(used)) and len(m) >= 2

    o2 = os.path.join(tmp_path, "out_topo")
    assert main(["topolayers", "--edges", epath, "--out", o2,
                 "--max-iter", "10", "--cores", "4"]) == 0
    layers = {r.vertex_id: r.layer for r in spark.read.parquet(o2).collect()}
    assert layers[1] == 0 and layers[5] == layers[4] + 1

    o3 = os.path.join(tmp_path, "out_lm")
    assert main(["landmarks", "--edges", epath, "--out", o3,
                 "--landmarks", "1,3", "--k", "2", "--cores", "4"]) == 0
    lm = spark.read.parquet(o3)
    assert lm.count() == 8  # matches test_landmark_distances_truncated_bfs


def test_cli_round3b_embedding_corpus_cmds(spark, tmp_path):
    """densest/node2vec/skipgram/pmi/powerlaw subcommands round-trip
    through parquet with the expected schemas."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (2, 4)],
        "subject long, object long",
    )
    epath = os.path.join(tmp_path, "e3b")
    edges.write.parquet(epath)
    expect = {
        "densest": {"peel_round", "n_vertices", "n_edges", "density"},
        "node2vec": {"walk_id", "step", "vertex_id"},
        "skipgram": {"center", "context", "cnt"},
        "pmi": {"center", "context", "cnt", "pmi"},
        "powerlaw": {"n_tail", "dmin", "alpha"},
    }
    for algo, cols in expect.items():
        opath = os.path.join(tmp_path, f"out3b_{algo}")
        assert main([
            algo, "--edges", epath, "--out", opath, "--cores", "4",
            "--k", "2",
        ]) == 0
        out = spark.read.parquet(opath)
        assert set(out.columns) == cols, algo
        assert out.count() >= 1


def test_cli_session3_eigen_louvain_opic(spark, tmp_path):
    """eigen/louvain/opic subcommands round-trip through parquet with the
    expected schemas and sane invariants (eigen scores sum ≈ 1 over
    nonzero paths; louvain labels cover every vertex; opic history > 0)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "e_s3")
    edges.write.parquet(epath)
    expect = {
        "eigen": {"vertex_id", "paths_k", "score"},
        "louvain": {"vertex_id", "community"},
        "opic": {"vertex_id", "history", "cash"},
    }
    for algo, cols in expect.items():
        opath = os.path.join(tmp_path, f"out_s3_{algo}")
        assert main([
            algo, "--edges", epath, "--out", opath, "--cores", "4",
            "--k", "2", "--max-iter", "2",
        ]) == 0
        out = spark.read.parquet(opath)
        assert set(out.columns) == cols, algo
        assert out.count() == 4
    opic_rows = spark.read.parquet(
        os.path.join(tmp_path, "out_s3_opic")
    ).collect()
    assert all(r.history > 0 for r in opic_rows)
