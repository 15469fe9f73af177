"""Command-line entry point — the spark-submit shape of the engine:

    spark-submit --py-files pregel_rs_spark.zip -m ... \
        python -m pregel_rs_spark ALGO --edges edges.parquet --out out/

    python -m pregel_rs_spark pagerank --edges /data/edges --out /data/ranks \
        --tol 1e-6 --max-iter 50 --checkpoint-root /data/ck --resume

Reads an edge table ``(subject, object[, weight])`` from parquet (or an
Iceberg table name when the runtime catalog is configured — same
``TableStore`` contract as the library), runs one built-in algorithm, and
writes the result parquet.  On a cluster, pass ``--master`` (or let
spark-submit set it) and size ``--shuffle-partitions`` to the data.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m pregel_rs_spark",
        description="PySpark-native Pregel-style link-graph analytics",
    )
    ap.add_argument("algo", choices=[
        "pagerank", "cc", "cc_star", "scc", "lpa", "triangles",
        "clustering", "sssp", "hits", "kcore", "degrees", "histogram",
        "reciprocity", "harmonic", "walks", "cocitation", "coupling",
        "assortativity", "ktruss", "linkpred", "katz", "squares",
        "transitivity", "modularity", "effdiam", "trustrank", "spammass",
        "negsample", "neighsample", "salsa", "mis", "redirects",
        "coreness", "matching", "topolayers", "landmarks", "bowtie",
        "densest", "node2vec", "skipgram", "pmi", "powerlaw",
        "eigen", "louvain", "opic",
    ])
    ap.add_argument("--edges", required=True,
                    help="parquet path (or Iceberg table) with (subject, object)")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--weight-col", default=None,
                    help="edge weight column (pagerank / sssp)")
    ap.add_argument("--init-ranks", default=None,
                    help="pagerank: parquet of (vertex_id, rank) from a "
                         "previous run — warm-start the iteration "
                         "(incremental crawl update)")
    ap.add_argument("--source", type=int, default=None, help="sssp source")
    ap.add_argument("--min-shared", type=int, default=2,
                    help="cocitation/coupling/linkpred: min common neighbors")
    ap.add_argument("--max-degree", type=int, default=1000,
                    help="cocitation/coupling/linkpred/squares: hub cap")
    ap.add_argument("--k", type=int, default=3,
                    help="kcore k / harmonic radius / walks length / "
                         "katz depth / effdiam rounds")
    ap.add_argument("--beta", type=float, default=0.1,
                    help="katz attenuation factor")
    ap.add_argument("--seeds", default=None,
                    help="trustrank/spammass: parquet of trusted vertex ids")
    ap.add_argument("--n-per-vertex", type=int, default=1,
                    help="negsample: negatives drawn per vertex")
    ap.add_argument("--seed", type=int, default=42,
                    help="negsample/neighsample: hash seed")
    ap.add_argument("--dmin", type=int, default=2,
                    help="powerlaw: tail threshold degree")
    ap.add_argument("--w-return", type=int, default=1,
                    help="node2vec: integer return weight")
    ap.add_argument("--w-near", type=int, default=4,
                    help="node2vec: integer BFS-side weight")
    ap.add_argument("--w-far", type=int, default=2,
                    help="node2vec: integer DFS-side weight")
    ap.add_argument("--window", type=int, default=2,
                    help="skipgram/pmi: co-occurrence window")
    ap.add_argument("--fanouts", default="2,2",
                    help="neighsample: comma-separated per-hop fan-outs")
    ap.add_argument("--landmarks", default=None,
                    help="landmarks: comma-separated landmark vertex ids")
    ap.add_argument("--checkpoint-root", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from pregel_rs_spark import GraphFrame
    from pregel_rs_spark.sources.io import get_spark

    # getOrCreate reuses an already-running session (e.g. under pytest or
    # an interactive driver) — in that case it is not ours to stop
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(
        f"pregel-rs-spark-{args.algo}",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
        master=args.master,
    )
    spark.sparkContext.setLogLevel("WARN")
    edges = spark.read.parquet(args.edges)

    if args.algo == "redirects":
        # functional pointer table, not a multigraph — resolve and exit
        # before GraphFrame's multi-edge-friendly validation
        from pregel_rs_spark.operators.redirects import resolve_redirects

        res = resolve_redirects(edges, max_rounds=args.max_iter or 32)
        res.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"redirects: wrote {n} rows -> {args.out}")
        if owns_session:
            spark.stop()
        return 0

    g = GraphFrame.from_edges(edges)

    store = None
    if args.checkpoint_root:
        from pregel_rs_spark.plans.checkpoint import CheckpointStore

        store = CheckpointStore(
            spark, args.checkpoint_root,
            config_token=f"{args.algo}-d{args.damping}",
        )

    from pregel_rs_spark import algorithms as A

    if args.algo == "pagerank":
        init_ranks = (
            spark.read.parquet(args.init_ranks) if args.init_ranks else None
        )
        res = A.pagerank(
            g, damping=args.damping, tol=args.tol,
            max_iterations=args.max_iter, weight=args.weight_col,
            checkpoint_store=store, checkpoint_every=args.checkpoint_every,
            resume=args.resume, init_ranks=init_ranks,
        )
    elif args.algo == "cc":
        res = A.connected_components(g, max_iterations=args.max_iter)
    elif args.algo == "cc_star":
        res = A.connected_components(g, method="star",
                                     max_iterations=args.max_iter)
    elif args.algo == "scc":
        res = A.strongly_connected_components(g)
    elif args.algo == "lpa":
        res = A.label_propagation(g, max_iterations=args.max_iter)
    elif args.algo == "triangles":
        res = A.triangle_count(g)
    elif args.algo == "clustering":
        res = A.clustering_coefficient(g)
    elif args.algo == "sssp":
        if args.source is None:
            print("sssp requires --source", file=sys.stderr)
            return 2
        res = A.sssp(g, source=args.source, weight_column=args.weight_col,
                     max_iterations=args.max_iter)
    elif args.algo == "hits":
        res = A.hits(g, iterations=args.max_iter)
    elif args.algo == "salsa":
        res = A.salsa(g, iterations=args.max_iter)
    elif args.algo == "mis":
        res = A.maximal_independent_set(g)
    elif args.algo == "matching":
        res = A.maximal_matching(g, max_rounds=args.max_iter)
    elif args.algo == "topolayers":
        res = A.topo_layers(g, max_layers=args.max_iter)
    elif args.algo == "landmarks":
        if not args.landmarks:
            print("landmarks requires --landmarks", file=sys.stderr)
            return 2
        res = A.landmark_distances(
            g, [int(x) for x in args.landmarks.split(",")],
            max_hops=args.k,
        )
    elif args.algo == "bowtie":
        res = A.bowtie_classes(g)
    elif args.algo == "kcore":
        res = A.k_core(g, k=args.k)
    elif args.algo == "coreness":
        res = A.coreness(g)
    elif args.algo == "ktruss":
        res = A.k_truss(g, k=args.k)
    elif args.algo == "degrees":
        res = g.out_degrees_full().join(
            g.in_degrees_full().select("vertex_id", "in_degree"), "vertex_id"
        )
    elif args.algo == "histogram":
        res = A.degree_histogram(g)
    elif args.algo == "reciprocity":
        res = A.reciprocity(g)
    elif args.algo == "harmonic":
        res = A.harmonic_centrality(g, k=args.k)
    elif args.algo == "walks":
        res = A.random_walks(g, length=args.k)
    elif args.algo == "densest":
        res = A.densest_subgraph(g)
    elif args.algo == "node2vec":
        res = A.node2vec_walks(
            g, length=args.k, w_return=args.w_return,
            w_near=args.w_near, w_far=args.w_far, seed=args.seed,
        )
    elif args.algo == "skipgram":
        res = A.skipgram_pairs(
            A.random_walks(g, length=args.k, seed=args.seed),
            window=args.window,
        )
    elif args.algo == "pmi":
        res = A.pmi_scores(
            A.skipgram_pairs(
                A.random_walks(g, length=args.k, seed=args.seed),
                window=args.window,
            )
        )
    elif args.algo == "powerlaw":
        res = A.powerlaw_alpha(g, dmin=args.dmin)
    elif args.algo == "eigen":
        res = A.eigenvector_centrality(g, k=args.k)
    elif args.algo == "louvain":
        res = A.louvain(g, rounds=args.max_iter)
    elif args.algo == "opic":
        res = A.opic(g, k=args.k)
    elif args.algo in ("cocitation", "coupling"):
        res = A.cocitation_pairs(
            g, min_shared=args.min_shared,
            max_out_degree=args.max_degree, direction=args.algo,
        )
    elif args.algo == "assortativity":
        res = A.degree_assortativity(g)
    elif args.algo == "linkpred":
        res = A.link_prediction(g, min_shared=args.min_shared,
                                max_degree=args.max_degree)
    elif args.algo == "katz":
        res = A.katz_centrality(g, beta=args.beta, k=args.k)
    elif args.algo == "squares":
        res = A.squares(g, max_degree=args.max_degree)
    elif args.algo == "transitivity":
        res = A.transitivity(g)
    elif args.algo == "modularity":
        res = A.modularity(g, A.label_propagation(g, max_iterations=args.max_iter))
    elif args.algo == "effdiam":
        res = A.effective_diameter_frame(g, k=args.k)
    elif args.algo in ("trustrank", "spammass"):
        if not args.seeds:
            print(f"{args.algo} requires --seeds", file=sys.stderr)
            return 2
        seeds = spark.read.parquet(args.seeds)
        fn = A.trustrank if args.algo == "trustrank" else A.spam_mass
        res = fn(g, seeds, damping=args.damping, tol=args.tol,
                 max_iterations=args.max_iter)
    elif args.algo == "negsample":
        res = A.negative_edge_samples(
            g, n_per_vertex=args.n_per_vertex, seed=args.seed
        )
    elif args.algo == "neighsample":
        res = A.neighbor_sample(
            g, fanouts=[int(x) for x in args.fanouts.split(",")],
            seed=args.seed,
        )
    else:  # pragma: no cover - argparse choices guard
        raise AssertionError(args.algo)

    res.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"{args.algo}: wrote {n} rows -> {args.out}")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
