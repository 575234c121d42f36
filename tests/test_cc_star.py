"""Large-star/small-star connected components (_cc_star): correctness
on adversarial topologies and the O(log n) round bound that plain
min-label propagation cannot meet (VERDICT r2 next-round #7)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from pyspark.sql import functions as F


def _labels(spark, n_nodes, edges, max_rounds=30):
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    labels, rounds = entrymod._cc_star(nodes, pairs, max_rounds=max_rounds)
    return {r.node: r.label for r in labels.collect()}, rounds


def test_path_graph_200_nodes_converges_logarithmically(spark):
    """A 200-node path has diameter 199: label propagation needs ~199
    rounds, star contraction must finish in O(log n) — well under 15."""
    got, rounds = _labels(spark, 200, [(i, i + 1) for i in range(199)])
    assert got == {i: 0 for i in range(200)}
    assert rounds <= 15, f"took {rounds} rounds"


def test_mixed_components_and_isolates(spark):
    edges = [(0, 1), (1, 2),          # component {0,1,2}
             (5, 6),                  # component {5,6}
             (8, 9), (9, 10), (8, 10)]  # triangle {8,9,10}
    got, _ = _labels(spark, 12, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5,
                   7: 7, 8: 8, 9: 8, 10: 8, 11: 11}


def test_star_and_duplicate_edges(spark):
    """Hub-and-spoke plus duplicate/reversed edges must not multiply."""
    edges = [(0, i) for i in range(1, 50)] + [(i, 0) for i in range(1, 50)]
    got, rounds = _labels(spark, 50, edges)
    assert got == {i: 0 for i in range(50)}
    assert rounds <= 6


def test_empty_edge_set(spark):
    got, _ = _labels(spark, 5, [])
    assert got == {i: i for i in range(5)}
